package graft.chat

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}

/** Pure-JVM bcrypt (OpenBSD `$2a$`/`$2b$`/`$2y$`), implemented from the
  * public specification: Provos & Mazières, "A Future-Adaptable Password
  * Scheme" (USENIX 1999) and the OpenBSD `bcrypt.c`/`blowfish.c` reference
  * behavior. This is the hash the reference system stores for its users
  * (backend/main.py:62-66, passlib `CryptContext(schemes=["bcrypt"])`), so
  * a migrating deployment can verify its existing `users` table directly;
  * [[Auth.checkPassword]] dispatches `$2*$` strings here.
  *
  * Blowfish's initial P-array and S-boxes are the first 1042 fractional
  * 32-bit words of π — public mathematical constants. They are DERIVED at
  * class-load time from a fixed-point Machin-formula computation of π
  * (16·arctan(1/5) − 4·arctan(1/239) over BigInteger) rather than embedded
  * as a table; BcryptSpec pins the published first/last words
  * (P[0]=0x243F6A88, P[17]=0x8979FB1B, S[0]=0xD1310BA6) and full test
  * vectors, so a derivation error cannot pass silently.
  *
  * Variant semantics (all verify-compatible):
  *  - `$2b$`: password truncated to 72 bytes, then a NUL appended — the
  *    current OpenBSD scheme and what passlib emits by default.
  *  - `$2a$`/`$2y$`: key stream length is `(len+1)` as an unsigned 8-bit
  *    value (the historical wraparound for >254-byte passwords is
  *    reproduced faithfully); `$2y$` is crypt_blowfish's rename of the
  *    fixed `$2a$` and is byte-identical for all inputs.
  */
object Bcrypt {

  // --- Blowfish initial state: fractional hex digits of π ---

  private val Words = 18 + 4 * 256

  /** arctan(1/x) in fixed point with `prec` fractional bits (truncating —
    * each term adds < 1 ulp of error, bounded by the 64 guard bits below).
    */
  private def atanInv(x: Long, prec: Int): BigInteger = {
    val xB = BigInteger.valueOf(x)
    val x2 = xB.multiply(xB)
    var term = BigInteger.ONE.shiftLeft(prec).divide(xB)
    var sum = term
    var n = 1L
    while (term.signum != 0) {
      term = term.divide(x2)
      n += 2
      val t = term.divide(BigInteger.valueOf(n))
      sum = if (((n - 1) / 2) % 2 == 1) sum.subtract(t) else sum.add(t)
    }
    sum
  }

  /** The 1042 initial 32-bit words (P ++ S), computed once per JVM. */
  private lazy val piWords: Array[Int] = {
    val prec = 32 * Words + 64 // 64 guard bits over the ~8k truncated terms
    val pi = atanInv(5, prec).shiftLeft(4)
      .subtract(atanInv(239, prec).shiftLeft(2))
    val frac = pi.subtract(BigInteger.valueOf(3).shiftLeft(prec))
    val digits = frac.shiftRight(64) // exactly 32*Words fractional bits left
    val bytes = digits.toByteArray
    val out = new Array[Int](Words)
    // toByteArray may carry a leading zero or drop leading zero bytes —
    // index from the END, which is exact
    val base = bytes.length - 4 * Words
    var i = 0
    while (i < Words) {
      val o = base + 4 * i
      out(i) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      i += 1
    }
    out
  }

  // --- Blowfish core ---

  private final class State {
    val p: Array[Int] = java.util.Arrays.copyOfRange(piWords, 0, 18)
    val s: Array[Int] = java.util.Arrays.copyOfRange(piWords, 18, Words)

    @inline private def f(x: Int): Int =
      ((s(x >>> 24) + s(256 + ((x >>> 16) & 0xff))) ^
        s(512 + ((x >>> 8) & 0xff))) + s(768 + (x & 0xff))

    /** One 64-bit block; returns (l << 32) | r. Round keys P[1..16] are
      * folded into the rounds (OpenBSD's BLFRND layout), so the output
      * whitening is P[17] alone on what ends up as the left half.
      */
    def encipher(l0: Int, r0: Int): Long = {
      var l = l0 ^ p(0)
      var r = r0
      var i = 1
      while (i <= 16) {
        r ^= f(l) ^ p(i)
        val t = l; l = r; r = t // swap each round
        i += 1
      }
      // after 16 alternating rounds l = Xl_16, r = Xr_15:
      // out_l = Xr_15 ^ P[17], out_r = Xl_16
      (((r ^ p(17)).toLong & 0xffffffffL) << 32) | (l.toLong & 0xffffffffL)
    }
  }

  /** Next big-endian 32-bit word from a cyclic byte stream of length
    * `len` over `data` (OpenBSD `Blowfish_stream2word`).
    */
  @inline private def stream2word(data: Array[Byte], len: Int, j0: Int): (Int, Int) = {
    var w = 0
    var j = j0
    var i = 0
    while (i < 4) {
      w = (w << 8) | (data(j % len) & 0xff)
      j += 1
      i += 1
    }
    (w, j % len)
  }

  /** `Blowfish_expandstate` (with salt) / `Blowfish_expand0state` (salt
    * null): key-dependent P/S rekeying, one pass.
    */
  private def expand(st: State, key: Array[Byte], keyLen: Int,
      salt: Array[Byte]): Unit = {
    var j = 0
    var i = 0
    while (i < 18) {
      val (w, j2) = stream2word(key, keyLen, j)
      st.p(i) ^= w
      j = j2
      i += 1
    }
    var l = 0
    var r = 0
    var sj = 0
    i = 0
    while (i < 18) {
      if (salt != null) {
        val (wl, s1) = stream2word(salt, salt.length, sj)
        val (wr, s2) = stream2word(salt, salt.length, s1)
        l ^= wl; r ^= wr; sj = s2
      }
      val lr = st.encipher(l, r)
      l = (lr >>> 32).toInt; r = lr.toInt
      st.p(i) = l; st.p(i + 1) = r
      i += 2
    }
    i = 0
    while (i < 1024) {
      if (salt != null) {
        val (wl, s1) = stream2word(salt, salt.length, sj)
        val (wr, s2) = stream2word(salt, salt.length, s1)
        l ^= wl; r ^= wr; sj = s2
      }
      val lr = st.encipher(l, r)
      l = (lr >>> 32).toInt; r = lr.toInt
      st.s(i) = l; st.s(i + 1) = r
      i += 2
    }
  }

  // "OrpheanBeholderScryDoubt" as six big-endian words (public constant).
  private val CText = {
    val b = "OrpheanBeholderScryDoubt".getBytes(UTF_8)
    (0 until 6).map(i => ((b(4 * i) & 0xff) << 24) | ((b(4 * i + 1) & 0xff) << 16) |
      ((b(4 * i + 2) & 0xff) << 8) | (b(4 * i + 3) & 0xff)).toArray
  }

  /** Raw 23-byte bcrypt digest (eksblowfish + 64 ECB encryptions). */
  private def rawHash(password: String, salt: Array[Byte], cost: Int,
      minor: Char): Array[Byte] = {
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    require(cost >= 4 && cost <= 31, s"bcrypt cost out of range: $cost")
    val pw = password.getBytes(UTF_8)
    // key stream length per variant; the buffer itself carries one NUL so
    // the cyclic reader can include it
    val keyLen = minor match {
      case 'b' => math.min(pw.length, 72) + 1
      case _ => (pw.length + 1) & 0xff match { case 0 => 256; case n => n }
      // (u_int8_t)(len+1): 255-byte passwords wrap to 0 — OpenBSD then
      // cycles a zero-length... in practice C reads j % 0 as UB; crypt
      // implementations treat it as 256-byte period. Lengths that large
      // never reach here from the reference (HTTP passwords), but the
      // arithmetic is kept faithful for the 0..254 range.
    }
    val key = java.util.Arrays.copyOf(pw, math.max(keyLen, 1))
    val st = new State
    expand(st, key, keyLen, salt)
    var k = 0L
    val rounds = 1L << cost
    while (k < rounds) {
      expand(st, key, keyLen, null)
      expand(st, salt, salt.length, null)
      k += 1
    }
    val c = CText.clone()
    var rep = 0
    while (rep < 64) {
      var i = 0
      while (i < 6) {
        val lr = st.encipher(c(i), c(i + 1))
        c(i) = (lr >>> 32).toInt; c(i + 1) = lr.toInt
        i += 2
      }
      rep += 1
    }
    val out = new Array[Byte](23)
    var i = 0
    while (i < 23) {
      out(i) = (c(i / 4) >>> (24 - 8 * (i % 4))).toByte
      i += 1
    }
    out
  }

  // --- bcrypt's base64 (alphabet ./A-Za-z0-9, no padding) ---

  private val B64 =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val B64Inv: Array[Byte] = {
    val inv = Array.fill[Byte](128)(-1)
    B64.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i.toByte }
    inv
  }

  private[chat] def b64Encode(d: Array[Byte]): String = {
    val sb = new StringBuilder
    var off = 0
    while (off < d.length) {
      var c1 = d(off) & 0xff; off += 1
      sb.append(B64(c1 >> 2)); c1 = (c1 & 0x03) << 4
      if (off >= d.length) { sb.append(B64(c1)) }
      else {
        val c2 = d(off) & 0xff; off += 1
        sb.append(B64(c1 | (c2 >> 4)))
        var c3 = (c2 & 0x0f) << 2
        if (off >= d.length) { sb.append(B64(c3)) }
        else {
          val c4 = d(off) & 0xff; off += 1
          sb.append(B64(c3 | (c4 >> 6)))
          sb.append(B64(c4 & 0x3f))
        }
      }
    }
    sb.toString
  }

  private[chat] def b64Decode(s: String, maxLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(maxLen)
    var i = 0
    while (i + 1 < s.length && out.size < maxLen) {
      val c1 = B64Inv(s.charAt(i) & 0x7f); val c2 = B64Inv(s.charAt(i + 1) & 0x7f)
      if (c1 < 0 || c2 < 0) throw new IllegalArgumentException("bad bcrypt b64")
      out.write(((c1 << 2) | (c2 >> 4)) & 0xff)
      if (i + 2 < s.length && out.size < maxLen) {
        val c3 = B64Inv(s.charAt(i + 2) & 0x7f)
        if (c3 < 0) throw new IllegalArgumentException("bad bcrypt b64")
        out.write((((c2 & 0x0f) << 4) | (c3 >> 2)) & 0xff)
        if (i + 3 < s.length && out.size < maxLen) {
          val c4 = B64Inv(s.charAt(i + 3) & 0x7f)
          if (c4 < 0) throw new IllegalArgumentException("bad bcrypt b64")
          out.write((((c3 & 0x03) << 6) | c4) & 0xff)
        }
      }
      i += 4
    }
    out.toByteArray
  }

  // --- public surface ---

  private val Stored = """\$2([abxy])\$(\d\d)\$([./A-Za-z0-9]{22})([./A-Za-z0-9]{31})""".r

  /** `$2b$` hash with a fresh random salt (the format passlib's default
    * emits for the reference's users table). Cost 12 is the 2023-era
    * interactive-login recommendation.
    */
  def hash(password: String, cost: Int = 12,
      rng: SecureRandom = new SecureRandom()): String = {
    val salt = new Array[Byte](16)
    rng.nextBytes(salt)
    hashWithSalt(password, salt, cost, 'b')
  }

  /** Deterministic form for tests / migrations with a caller-chosen salt. */
  def hashWithSalt(password: String, salt: Array[Byte], cost: Int,
      minor: Char = 'b'): String = {
    val digest = rawHash(password, salt, cost, minor)
    f"$$2$minor$$$cost%02d$$${b64Encode(salt)}${b64Encode(digest)}"
  }

  /** Constant-time verify of any `$2a$`/`$2b$`/`$2x$`/`$2y$` stored hash;
    * malformed strings verify false rather than throwing (a corrupt users
    * row must not 500 the login path). `$2x$` is treated as `$2a$` — the
    * sign-extension-bug variant differs only for 8-bit-high passwords,
    * which the reference (UTF-8 JSON) never produced with that prefix.
    */
  def check(password: String, stored: String): Boolean = stored match {
    case Stored(minorS, costS, saltS, hashS) =>
      scala.util.Try {
        val minor = if (minorS == "b") 'b' else 'a'
        val cost = costS.toInt
        val salt = b64Decode(saltS, 16)
        val want = b64Decode(hashS, 23)
        salt.length == 16 && cost >= 4 && cost <= 31 &&
          MessageDigest.isEqual(rawHash(password, salt, cost, minor), want)
      }.getOrElse(false)
    case _ => false
  }

  /** Test hook: the first/last published Blowfish constants, proving the
    * π derivation reproduces the spec's tables.
    */
  private[chat] def initialWords: (Int, Int, Int, Int) =
    (piWords(0), piWords(17), piWords(18), piWords(Words - 1))
}
