package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.report.{OAuth1Creds, TwitterPoster}

class TwitterPosterSpec extends AnyFunSuite {

  // The public OAuth 1.0a worked example from the Twitter API signing
  // docs (also the RFC 5849 flow): fixed keys, nonce and timestamp give
  // a known HMAC-SHA1 signature. Cross-checked against an independent
  // Python implementation of the RFC.
  private val creds = OAuth1Creds(
    consumerKey = "xvz1evFS4wEEPTGEFPHBog",
    consumerSecret = "kAcSOqF21Fu85e7zjz7ZN2U4ZRhfV3WpwPAoE3Z7kBw",
    token = "370773112-GmHxMAgYyLbNEtIKZeRNFsMKPR9EyMZeS9weJAEb",
    tokenSecret = "LswwdoUaIvS8ltyTt5jkRh4J50vUPVVHtR2YPi5kE")

  test("HMAC-SHA1 signature matches the published OAuth1 test vector") {
    val poster = new TwitterPoster(creds)
    val params = Seq(
      "status" -> "Hello Ladies + Gentlemen, a signed OAuth request!",
      "include_entities" -> "true",
      "oauth_consumer_key" -> creds.consumerKey,
      "oauth_nonce" -> "kYjzVBB8Y0ZFabxSWbWovY3uYSQ2pTgmZeNu2VS4cg",
      "oauth_signature_method" -> "HMAC-SHA1",
      "oauth_timestamp" -> "1318622958",
      "oauth_token" -> creds.token,
      "oauth_version" -> "1.0")
    val sig = poster.signature("POST",
      "https://api.twitter.com/1.1/statuses/update.json", params)
    assert(sig == "hCtSmYh+iHYCEqBWrE7C7hYmtUk=")
  }

  test("percent-encoding is the strict RFC 3986 unreserved form") {
    val poster = new TwitterPoster(creds)
    assert(poster.pctEncode("Ladies + Gentlemen") == "Ladies%20%2B%20Gentlemen")
    assert(poster.pctEncode("An encoded string!") == "An%20encoded%20string%21")
    assert(poster.pctEncode("Dogs, Cats & Mice") == "Dogs%2C%20Cats%20%26%20Mice")
    assert(poster.pctEncode("☃") == "%E2%98%83") // snowman, UTF-8 bytes
    assert(poster.pctEncode("a-._~Z9") == "a-._~Z9")
  }

  test("postStatus POSTs a signed form body to the endpoint") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var gotAuth: String = null
    @volatile var gotBody: String = null
    @volatile var gotCt: String = null
    server.createContext("/1.1/statuses/update.json", exchange => {
      gotAuth = exchange.getRequestHeaders.getFirst("Authorization")
      gotCt = exchange.getRequestHeaders.getFirst("Content-Type")
      gotBody = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
      val resp = """{"id": 1}""".getBytes(UTF_8)
      exchange.sendResponseHeaders(200, resp.length)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    try {
      val url =
        s"http://127.0.0.1:${server.getAddress.getPort}/1.1/statuses/update.json"
      val poster = new TwitterPoster(creds, endpoint = url,
        nonce = () => "fixednonce", timestamp = () => 1318622958L)
      val (code, body) = poster.postStatus("5 new events from 🇺🇸  (3) url #takuan")
      assert(code == 200 && body == """{"id": 1}""")
      assert(gotCt == "application/x-www-form-urlencoded")
      assert(gotBody.startsWith("status=5%20new%20events%20from%20%F0%9F%87%BA%F0%9F%87%B8"))
      assert(gotAuth != null && gotAuth.startsWith("OAuth "))
      Seq("oauth_consumer_key=\"xvz1evFS4wEEPTGEFPHBog\"",
        "oauth_nonce=\"fixednonce\"", "oauth_signature_method=\"HMAC-SHA1\"",
        "oauth_timestamp=\"1318622958\"", "oauth_version=\"1.0\"",
        "oauth_signature=\"").foreach(f => assert(gotAuth.contains(f), gotAuth))
      // the signature in the header verifies against the same base string
      val expected = poster.signature("POST", url, Seq(
        "status" -> "5 new events from 🇺🇸  (3) url #takuan",
        "oauth_consumer_key" -> creds.consumerKey,
        "oauth_nonce" -> "fixednonce",
        "oauth_signature_method" -> "HMAC-SHA1",
        "oauth_timestamp" -> "1318622958",
        "oauth_token" -> creds.token,
        "oauth_version" -> "1.0"))
      assert(gotAuth.contains(s"""oauth_signature="${poster.pctEncode(expected)}""""), gotAuth)
    } finally server.stop(0)
  }
}
