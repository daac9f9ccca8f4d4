package graft.chat

import org.scalatest.funsuite.AnyFunSuite

/** bcrypt parity (VERDICT r4 item 5): the reference hashes passwords with
  * bcrypt via passlib (/root/reference/backend/main.py:62-66); these
  * vectors are the public jBCrypt test suite's (also shipped in Spring
  * Security), plus the published Blowfish constants pinning the π
  * derivation.
  */
class BcryptSpec extends AnyFunSuite {

  test("pi derivation reproduces the published Blowfish P/S constants") {
    val (p0, p17, s0, sLast) = Bcrypt.initialWords
    assert(p0 == 0x243f6a88, f"P[0] = $p0%08x")
    assert(p17 == 0x8979fb1b.toInt, f"P[17] = $p17%08x")
    assert(s0 == 0xd1310ba6.toInt, f"S[0][0] = $s0%08x")
    assert(sLast == 0x3ac372e6, f"S[3][255] = $sLast%08x")
  }

  // (password, full stored hash) — public jBCrypt vectors, cost 6, $2a$
  private val vectors = Seq(
    ("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
    ("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    ("abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"),
    ("abcdefghijklmnopqrstuvwxyz",
      "$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC"))

  test("reproduces the public jBCrypt $2a$ vectors bit-for-bit") {
    for ((pw, stored) <- vectors) {
      val salt = Bcrypt.b64Decode(stored.substring(7, 29), 16)
      assert(Bcrypt.hashWithSalt(pw, salt, 6, 'a') == stored, s"pw='$pw'")
      assert(Bcrypt.check(pw, stored), s"check failed for pw='$pw'")
      assert(!Bcrypt.check(pw + "x", stored), s"wrong pw verified for '$pw'")
    }
  }

  test("$2b$ round-trip, $2y$ alias, malformed inputs verify false") {
    val h = Bcrypt.hash("correct horse", cost = 6)
    assert(h.startsWith("$2b$06$") && h.length == 60)
    assert(Bcrypt.check("correct horse", h))
    assert(!Bcrypt.check("battery staple", h))
    // $2y$ is crypt_blowfish's byte-identical rename of fixed $2a$
    val salt = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    val a = Bcrypt.hashWithSalt("pw", salt, 6, 'a')
    assert(Bcrypt.check("pw", "$2y$" + a.substring(4)))
    assert(!Bcrypt.check("pw", "$9z$06$garbage"))
    assert(!Bcrypt.check("pw", ""))
    assert(!Bcrypt.check("pw", "$2b$06$short"))
  }

  test("72-byte key window: tails beyond 72 bytes never change the hash") {
    // each ExpandKey pass reads exactly 18 words = 72 bytes from offset 0,
    // which is WHY bcrypt has its 72-byte limit — $2b$ only made the
    // truncation explicit (the variants differ at the 255-byte length
    // wraparound, not here)
    val salt = Array.tabulate[Byte](16)(i => (i * 13 + 1).toByte)
    val base = "x" * 72
    for (minor <- Seq('a', 'b')) {
      assert(Bcrypt.hashWithSalt(base + "AAAA", salt, 4, minor) ==
        Bcrypt.hashWithSalt(base + "BBBB", salt, 4, minor), s"minor=$minor")
    }
    // but byte 72 itself (inside the window for a 71-byte password + NUL)
    // does matter
    assert(Bcrypt.hashWithSalt("x" * 70 + "A", salt, 4, 'b') !=
      Bcrypt.hashWithSalt("x" * 70 + "B", salt, 4, 'b'))
    // and $2a$ == $2b$ for all sub-72-byte passwords
    assert(Bcrypt.hashWithSalt("ordinary", salt, 4, 'a').substring(4) ==
      Bcrypt.hashWithSalt("ordinary", salt, 4, 'b').substring(4))
  }

  test("Auth.checkPassword dispatches bcrypt rows and keeps PBKDF2 rows") {
    val (pw, stored) = vectors(2)
    assert(Auth.checkPassword(pw, stored))
    assert(!Auth.checkPassword("wrong", stored))
    val pb = Auth.hashPassword("pw", 1000)
    assert(Auth.checkPassword("pw", pb))
  }
}
