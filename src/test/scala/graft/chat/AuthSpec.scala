package graft.chat

import graft.SparkSpec

/** P9 auth parity: password hash/verify + JWT encode/decode against
  * published vectors (RFC 7914 PBKDF2, the jwt.io HS256 example token) and
  * the reference's 401 semantics (/root/reference/backend/main.py:71-82).
  */
class AuthSpec extends SparkSpec {

  // fast-but-real iteration count for tests; production default is 210k
  private val iters = 1000

  test("PBKDF2-HMAC-SHA256 matches the RFC 7914 published vector") {
    val dk = Auth.pbkdf2("passwd", "salt".getBytes("UTF-8"), 1, 64)
    val hex = dk.map("%02x".format(_)).mkString
    assert(hex ==
      "55ac046e56e3089fec1691c22544b605f94185216dde0465e68b9d57c20dacbc" +
      "49ca9cccf179b645991664b39d77ef317c71b845b1e30bd509112041d3a19783")
  }

  test("hash/verify roundtrip; per-hash salts; wrong password and garbage fail") {
    val h1 = Auth.hashPassword("s3cret", iters)
    val h2 = Auth.hashPassword("s3cret", iters)
    assert(h1 != h2) // fresh random salt each time
    assert(h1.startsWith("$pbkdf2-sha256$"))
    assert(Auth.checkPassword("s3cret", h1) && Auth.checkPassword("s3cret", h2))
    assert(!Auth.checkPassword("s3cret2", h1))
    assert(!Auth.checkPassword("s3cret", "not-a-hash")) // malformed: false, not throw
    assert(!Auth.checkPassword("s3cret", ""))
  }

  test("JWT verify accepts the jwt.io HS256 example token (external golden)") {
    // header {"alg":"HS256","typ":"JWT"}, payload {sub,name,iat}, secret
    // "your-256-bit-secret" — the canonical public HS256 test vector
    val token = "eyJhbGciOiJIUzI1NiIsInR5cCI6IkpXVCJ9." +
      "eyJzdWIiOiIxMjM0NTY3ODkwIiwibmFtZSI6IkpvaG4gRG9lIiwiaWF0IjoxNTE2MjM5MDIyfQ." +
      "SflKxwRJSMeKKF2QT4fwpMeJf36POk6yJV_adQssw5c"
    val claims = Auth.decodeToken(token, "your-256-bit-secret")
    assert(claims.isDefined)
    assert(claims.get("sub") == "1234567890" && claims.get("name") == "John Doe")
    // wrong secret: signature fails
    assert(Auth.decodeToken(token, "other-secret").isEmpty)
  }

  test("token roundtrip, expiry, tampering, and user_id extraction (401 semantics)") {
    val now = 1700000000L
    val t = Auth.createAccessToken(Map("user_id" -> "u-42"), "k", 30, now)
    assert(Auth.currentUser(t, "k", now).contains("u-42"))
    assert(Auth.currentUser(t, "k", now + 29 * 60).contains("u-42"))
    // expired — exactly the reference's JWTError → 401
    assert(Auth.currentUser(t, "k", now + 31 * 60).isEmpty)
    // tampered payload (claims swapped) fails the signature
    val Array(h, _, s) = t.split('.')
    val forged = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"user_id":"u-1","exp":9999999999}""".getBytes("UTF-8"))
    assert(Auth.currentUser(s"$h.$forged.$s", "k", now).isEmpty)
    // valid token but no user_id claim → 401
    val noUid = Auth.createAccessToken(Map("name" -> "x"), "k", 30, now)
    assert(Auth.decodeToken(noUid, "k", now).isDefined)
    assert(Auth.currentUser(noUid, "k", now).isEmpty)
    // structurally broken tokens
    assert(Auth.decodeToken("abc", "k", now).isEmpty)
    assert(Auth.decodeToken("a.b.c", "k", now).isEmpty)
  }

  test("register -> login -> protected flow against the user table (P9 e2e)") {
    // the reference's /register + /login + /protected sequence
    // (backend/main.py:129-158, 85-90) as library calls over ChatStore
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_auth").resolve("users").toString
    val secret = "unit-test-secret"
    val signup = Seq(("Ada", "ada@x.io", "correct horse")).toDF("name", "email", "password")
    assert(ChatStore.registerUsers(spark,
      Auth.withHashedPasswords(signup, "password", iters), dir) == 1)

    // login: fetch by email, check password, mint a token with user_id
    val row = ChatStore.findByEmail(spark, dir, "ada@x.io").collect().head
    val stored = row.getAs[String]("password")
    assert(stored != "correct horse" && stored.startsWith("$pbkdf2-sha256$"))
    assert(Auth.checkPassword("correct horse", stored))
    assert(!Auth.checkPassword("wrong horse", stored))
    val uid = row.getAs[String]("user_id")
    val now = 1700000000L
    val token = Auth.createAccessToken(Map("user_id" -> uid), secret, 30, now)

    // protected route: token resolves back to the registered user
    assert(Auth.currentUser(token, secret, now).contains(uid))
    assert(Auth.currentUser(token, "other-secret", now).isEmpty)
  }

  test("batch registration: hashes are per-row salted and all verify (S7+P9)") {
    import spark.implicits._
    val users = Seq(("Ada", "ada@x.io", "pw-a"), ("Bo", "bo@x.io", "pw-b"),
      ("Cy", "cy@x.io", "pw-a")).toDF("name", "email", "password")
    val hashed = Auth.withHashedPasswords(users, "password", iters).collect()
    assert(hashed.length == 3)
    val byEmail = hashed.map(r => r.getString(1) -> r.getString(2)).toMap
    assert(Auth.checkPassword("pw-a", byEmail("ada@x.io")))
    assert(Auth.checkPassword("pw-b", byEmail("bo@x.io")))
    assert(!Auth.checkPassword("pw-b", byEmail("ada@x.io")))
    // same password, different users → different hashes (fresh salts)
    assert(byEmail("ada@x.io") != byEmail("cy@x.io"))
  }
}
