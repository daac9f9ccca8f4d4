package graft.chat

import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

/** Auth surface (SURVEY.md §2 P9): password hash/verify and JWT
  * access-token encode/decode, mirroring the reference's
  * `/register`–`/login`–`get_current_user` semantics
  * (/root/reference/backend/main.py:62-82,135,148,181):
  *
  *  - passwords are hashed with a fresh per-hash random salt and verified
  *    against the stored self-describing hash string. The reference uses
  *    bcrypt; this implementation uses PBKDF2-HMAC-SHA256 (the NIST
  *    password-hashing KDF that ships in the JDK — bcrypt does not, and
  *    this library adds no dependencies). Same contract: salted, slow,
  *    self-describing, constant-time verify.
  *  - access tokens are standard JWS compact JWTs, HS256 (the reference's
  *    `ALGORITHM`), with an `exp` NumericDate claim stamped
  *    `expiresInMinutes` ahead; decode verifies the signature
  *    constant-time, rejects expired tokens, and extracts `user_id`,
  *    returning None exactly where the reference raises 401 (bad
  *    signature, expired, or missing `user_id`).
  *
  * Batch form: [[withHashedPasswords]] hashes a column via
  * `mapPartitions` — per-row KDF work is deliberately CPU-heavy (that is
  * the point of a password hash), so the shape to care about is
  * partition-parallelism and per-partition factory reuse, not codegen.
  */
object Auth {

  // OWASP-recommended work factor for PBKDF2-HMAC-SHA256 (2023 guidance).
  private val DefaultIterations = 210000
  private val SaltBytes = 16
  private val KeyBytes = 32

  private def b64e(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  private def b64d(s: String): Array[Byte] = Base64.getUrlDecoder.decode(s)

  /** Exposed to tests so the KDF pins against the published RFC 7914
    * PBKDF2-HMAC-SHA256 vectors rather than against itself.
    */
  private[chat] def pbkdf2(password: String, salt: Array[Byte], iters: Int,
      dkBytes: Int = KeyBytes): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iters, dkBytes * 8)
    try SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
    finally spec.clearPassword()
  }

  /** Modular-crypt-style self-describing hash:
    * `$pbkdf2-sha256$<iters>$<b64url salt>$<b64url dk>`.
    */
  def hashPassword(password: String, iterations: Int = DefaultIterations): String =
    hashPassword(password, iterations, new SecureRandom())

  /** Overload threading an explicit RNG so batch paths can construct one
    * SecureRandom per partition instead of one per row.
    */
  def hashPassword(password: String, iterations: Int, rng: SecureRandom): String = {
    val salt = new Array[Byte](SaltBytes)
    rng.nextBytes(salt)
    s"$$pbkdf2-sha256$$$iterations$$${b64e(salt)}$$${b64e(pbkdf2(password, salt, iterations))}"
  }

  /** Constant-time verify against a [[hashPassword]] string — or against
    * the reference system's own bcrypt hashes: `$2a$`/`$2b$`/`$2y$`
    * strings (what passlib wrote to the reference's `users` table,
    * backend/main.py:62-66) dispatch to [[Bcrypt.check]], so a migrated
    * deployment verifies its existing rows unchanged. Malformed stored
    * values verify false rather than throwing (a corrupt row must not 500
    * the login path).
    */
  def checkPassword(password: String, stored: String): Boolean =
    stored.split('$') match {
      case Array("", "pbkdf2-sha256", iters, salt, dk) =>
        (for {
          i <- scala.util.Try(iters.toInt)
          s <- scala.util.Try(b64d(salt))
          d <- scala.util.Try(b64d(dk))
        } yield MessageDigest.isEqual(pbkdf2(password, s, i), d)).getOrElse(false)
      case a if a.length > 1 && a(1).startsWith("2") => Bcrypt.check(password, stored)
      case _ => false
    }

  // --- JWT (JWS compact serialization, HS256) ---

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  private def hmac(secret: String, data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Encode a JWT with the given claims plus an `exp` NumericDate
    * `expiresInMinutes` from `nowEpochSeconds` (injectable for tests; the
    * reference stamps `utcnow + expires_delta`).
    */
  def createAccessToken(claims: Map[String, Any], secret: String,
      expiresInMinutes: Long = 30,
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000): String = {
    val payload = claims + ("exp" -> (nowEpochSeconds + expiresInMinutes * 60))
    val header = b64e("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val body = b64e(mapper.writeValueAsBytes(payload))
    s"$header.$body.${b64e(hmac(secret, s"$header.$body"))}"
  }

  /** Verify + decode: returns the claims map when the signature checks out
    * (constant-time compare), the header says HS256, and any `exp` claim
    * is in the future; None otherwise. Tokens without `exp` are accepted
    * (jose semantics: exp is only enforced when present).
    */
  def decodeToken(token: String, secret: String,
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Option[Map[String, Any]] =
    token.split('.') match {
      case Array(h, b, sig) =>
        scala.util.Try {
          val okSig = MessageDigest.isEqual(b64d(sig), hmac(secret, s"$h.$b"))
          val header = mapper.readValue(b64d(h), classOf[Map[String, Any]])
          val claims = mapper.readValue(b64d(b), classOf[Map[String, Any]])
          val okAlg = header.get("alg").contains("HS256")
          val okExp = claims.get("exp").forall {
            case n: Number => n.longValue > nowEpochSeconds
            case _ => false
          }
          if (okSig && okAlg && okExp) Some(claims) else None
        }.getOrElse(None)
      case _ => None
    }

  /** The reference's `get_current_user`: decode, then require a non-empty
    * `user_id` claim — None is its HTTP 401.
    */
  def currentUser(token: String, secret: String,
      nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Option[String] =
    decodeToken(token, secret, nowEpochSeconds)
      .flatMap(_.get("user_id"))
      .collect { case s: String if s.nonEmpty => s }

  /** Batch registration support: replaces `passwordCol` with its hash.
    * `mapPartitions` shape so the (deliberately slow) KDF runs
    * partition-parallel; the per-partition closure reuses one
    * SecureRandom. Iteration count is a parameter because bulk backfills
    * legitimately tune work factor vs throughput.
    */
  def withHashedPasswords(df: DataFrame, passwordCol: String,
      iterations: Int = DefaultIterations): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val idx = df.schema.fieldIndex(passwordCol)
    df.mapPartitions { it =>
      val rng = new SecureRandom() // one RNG per partition, not per row
      it.map { r =>
        Row.fromSeq(r.toSeq.updated(idx, hashPassword(r.getString(idx), iterations, rng)))
      }
    }(Encoders.row(df.schema))
  }
}
