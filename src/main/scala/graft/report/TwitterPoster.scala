package graft.report

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.ReportPublisher

/** OAuth 1.0a credentials for the status-update call
  * (reference: core/twitter.go:24-31 consumer + access token pairs). */
final case class OAuth1Creds(consumerKey: String, consumerSecret: String,
    token: String, tokenSecret: String)

/** S12: the real Twitter sink executor — an RFC 5849 (OAuth 1.0a)
  * HMAC-SHA1-signed `statuses/update` POST (reference:
  * core/twitter.go:88-104, which delegates the same signing to its
  * oauth1 client library).
  *
  * The endpoint URL, nonce, and timestamp are injectable: specs drive
  * the poster against a local in-process HTTP server (no network in the
  * sandbox) and pin the signature against the public OAuth test vector.
  * Like [[GitPublisher]], this is a driver-side effect after the
  * aggregation — deliberately not a Spark operator.
  *
  * @param endpoint normalized base URL (lowercase scheme/host, no query
  *                 string, default ports omitted) per RFC 5849 §3.4.1.2
  */
class TwitterPoster(creds: OAuth1Creds,
    endpoint: String = "https://api.twitter.com/1.1/statuses/update.json",
    nonce: () => String = () => java.util.UUID.randomUUID.toString.replace("-", ""),
    timestamp: () => Long = () => System.currentTimeMillis() / 1000L) {

  private val Unreserved: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet ++ Set('-', '.', '_', '~')

  /** Percent-encoding per RFC 5849 §3.6: UTF-8 bytes, uppercase hex,
    * only the RFC 3986 unreserved set left bare. */
  def pctEncode(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (b >= 0 && Unreserved(c)) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** RFC 5849 §3.4.1 signature base string + §3.4.2 HMAC-SHA1 over all
    * request parameters (oauth_* + body form fields). */
  def signature(method: String, url: String,
      params: Seq[(String, String)]): String = {
    val normalized = params
      .map { case (k, v) => pctEncode(k) -> pctEncode(v) }
      .sorted // byte order by encoded name, then encoded value (§3.4.1.3.2)
      .map { case (k, v) => s"$k=$v" }.mkString("&")
    val base =
      s"${method.toUpperCase}&${pctEncode(url)}&${pctEncode(normalized)}"
    val key = pctEncode(creds.consumerSecret) + "&" + pctEncode(creds.tokenSecret)
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(key.getBytes(UTF_8), "HmacSHA1"))
    java.util.Base64.getEncoder.encodeToString(mac.doFinal(base.getBytes(UTF_8)))
  }

  /** POST `status=<text>` with the OAuth Authorization header.
    * @return (HTTP status code, response body) */
  def postStatus(status: String): (Int, String) = {
    val oauth = Seq(
      "oauth_consumer_key" -> creds.consumerKey,
      "oauth_nonce" -> nonce(),
      "oauth_signature_method" -> "HMAC-SHA1",
      "oauth_timestamp" -> timestamp().toString,
      "oauth_token" -> creds.token,
      "oauth_version" -> "1.0")
    val body = Seq("status" -> status)
    val sig = signature("POST", endpoint, oauth ++ body)
    val header = "OAuth " + (oauth :+ ("oauth_signature" -> sig))
      .map { case (k, v) => s"""${pctEncode(k)}="${pctEncode(v)}"""" }
      .sorted.mkString(", ")
    val conn = URI.create(endpoint).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Authorization", header)
      conn.setRequestProperty("Content-Type", "application/x-www-form-urlencoded")
      val payload = body
        .map { case (k, v) => s"${pctEncode(k)}=${pctEncode(v)}" }.mkString("&")
      conn.getOutputStream.write(payload.getBytes(UTF_8))
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val resp = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
      (code, resp)
    } finally conn.disconnect()
  }
}

/** [[ReportPublisher]] wiring the real poster into the summary channel
  * (S12); CSV/git publication delegates to the inner publisher (S11).
  *
  * Failures are LOGGED, never propagated (reference: core/twitter.go
  * OnBatch logs "error tweeting" and continues): a transient network or
  * API error inside the report tick must not fail the streaming batch and
  * take the CSV/git channels down with it. Non-2xx responses are treated
  * the same way. */
class TwitterSummaryPublisher(poster: TwitterPoster, inner: ReportPublisher)
    extends ReportPublisher {
  override def publishCsv(dir: String, addresses: Long, events: Long): String =
    inner.publishCsv(dir, addresses, events)
  override def publishSummary(tweet: String): Unit =
    try {
      val (code, body) = poster.postStatus(tweet)
      if (code < 200 || code >= 300)
        System.err.println(
          s"[graft] error tweeting: HTTP $code ${body.take(200)}")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] error tweeting: ${e.getMessage}")
    }
}
