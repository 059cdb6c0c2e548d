package graft.util

import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.fs.Path

/** [[ConditionalPut]] backend over the S3 REST API: one `PUT` with
  * `If-None-Match: *`, SigV4-signed — the store-native create-if-
  * absent that S3 (since 2024), MinIO, Ceph RGW and R2 all honor.
  * `200 OK` → created (this caller won); `412 Precondition Failed`
  * (or `409` on stores that report a concurrent conditional loss that
  * way) → an object already exists. Anything else is an IOException —
  * NEVER mapped to "lost", so an outage can't be mistaken for losing
  * the race.
  *
  * Dependency-free by design (java.net + javax.crypto): the sandbox
  * has no cloud SDKs and no egress, so the adapter is spec-pinned two
  * ways instead — the SigV4 math against the AWS documentation's
  * worked example, and the full HTTP round-trip + race semantics
  * against an in-process JDK HttpServer implementing the same
  * conditional-PUT contract as [[graft.MockObjectStore]]
  * (S3ConditionalPutSpec). Deployments verify their store once via
  * the same contract suite, then `AtomicPut.register("s3a", adapter)`.
  *
  * RETRY SEMANTICS (documented, deliberate): one attempt, no retry
  * loop. A conditional PUT retried after an AMBIGUOUS failure (e.g. a
  * timeout whose first attempt actually landed) would see 412 from
  * its OWN earlier success and misreport "lost". Callers that need
  * retries already handle this at the protocol layer: every graft
  * commit path treats a lost arbitration as retryable-from-scratch
  * (re-read state, re-stage, re-arbitrate on the NEXT name), so a
  * false "lost" costs one extra protocol round, never correctness.
  *
  * @param endpoint  e.g. "https://s3.us-east-1.amazonaws.com" or a
  *                  MinIO/test URL; bucket is taken from the path URI
  *                  authority and addressed path-style
  *                  (endpoint/bucket/key), the form every
  *                  S3-compatible store accepts
  * @param region    SigV4 scope region
  * @param accessKey empty string = unsigned (anonymous test stores)
  */
final class S3ConditionalPut(endpoint: String, region: String,
    accessKey: String, secretKey: String,
    clock: () => Long = () => System.currentTimeMillis())
    extends ConditionalPut {

  private val base = URI.create(
    if (endpoint.endsWith("/")) endpoint.dropRight(1) else endpoint)

  override def putIfNoneMatch(path: Path, bytes: Array[Byte]): Boolean = {
    val u = path.toUri
    val bucket = u.getAuthority
    require(bucket != null && bucket.nonEmpty,
      s"path must carry the bucket as its authority: $path")
    val key = u.getPath.stripPrefix("/")
    val objectPath = s"/$bucket/$key"
    val url = new URL(base.toString + SigV4.uriEncode(objectPath,
      encodeSlash = false))
    val payloadSha = SigV4.sha256Hex(bytes)
    val amzDate = {
      val fmt = new java.text.SimpleDateFormat("yyyyMMdd'T'HHmmss'Z'")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      fmt.format(new java.util.Date(clock()))
    }
    val hostHeader = {
      // JDK HttpURLConnection omits the scheme's DEFAULT port from the
      // Host header it actually sends, so signing "host:443" for an
      // https endpoint would 403 every PUT — drop it to match the wire
      val p = base.getPort
      val defaultPort =
        if (base.getScheme == "https") 443 else 80
      if (p == -1 || p == defaultPort) base.getHost
      else s"${base.getHost}:$p"
    }
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("PUT")
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(bytes.length)
      conn.setRequestProperty("If-None-Match", "*")
      conn.setRequestProperty("x-amz-date", amzDate)
      conn.setRequestProperty("x-amz-content-sha256", payloadSha)
      if (accessKey.nonEmpty) {
        // Host is set by the HTTP client from the URL; sign it plus
        // exactly the x-amz-* headers and the precondition we send
        val signed = Seq(
          "host" -> hostHeader,
          "if-none-match" -> "*",
          "x-amz-content-sha256" -> payloadSha,
          "x-amz-date" -> amzDate)
        conn.setRequestProperty("Authorization",
          SigV4.authorization("PUT", objectPath, Nil, signed,
            payloadSha, amzDate, region, "s3", accessKey, secretKey))
      }
      val out = conn.getOutputStream
      try out.write(bytes) finally out.close()
      val code = conn.getResponseCode
      // drain whichever stream exists so keep-alive sockets are reusable
      try {
        val es = Option(conn.getErrorStream)
          .orElse(scala.util.Try(Option(conn.getInputStream)).toOption.flatten)
        es.foreach { s =>
          try { val buf = new Array[Byte](4096)
            while (s.read(buf) != -1) () } finally s.close()
        }
      } catch { case _: Exception => () }
      code match {
        case 200 | 201 => true
        // 412: the object definitively exists. 409 is AWS's
        // ConditionalRequestConflict — a CONCURRENT conditional write
        // was in flight and the outcome is UNKNOWN (the competing
        // write may itself fail, leaving no object at the key). Both
        // map to false here because every caller's contract is to
        // RE-READ the key's state before re-arbitrating (Lease /
        // AtomicPut do); `false` means "you did not win", never
        // "an object provably exists".
        case 412 | 409 => false
        case other => throw new java.io.IOException(
          s"conditional PUT $url failed: HTTP $other (neither created " +
            "nor a precondition loss — NOT retrying blindly, see class doc)")
      }
    } finally conn.disconnect()
  }
}
