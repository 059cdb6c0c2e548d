package graft.util

import java.nio.charset.StandardCharsets.UTF_8

/** AWS Signature Version 4 request signing (the published algorithm:
  * canonical request → string-to-sign → HMAC-SHA256 key derivation
  * chain → hex signature), dependency-free. Pure functions of the
  * request parts, so the math is pinned by the AWS documentation's
  * own worked example as a unit test (SigV4Spec: the 20150830
  * iam.amazonaws.com GET whose documented signature is
  * 5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7).
  *
  * Used by [[S3ConditionalPut]] to sign `PUT` + `If-None-Match: *`
  * against any SigV4 store (AWS S3, MinIO, Ceph RGW, R2). */
object SigV4 {

  def hmacSha256(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  def sha256Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    hex(md.digest(bytes))
  }

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** RFC 3986 encoding with AWS's rules: unreserved = A–Z a–z 0–9
    * '-' '.' '_' '~'; '/' preserved only when `encodeSlash` is false
    * (canonical URI vs query values); space is %20, never '+'. */
  def uriEncode(s: String, encodeSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) sb.append(c)
      else if (c == '/' && !encodeSlash) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** The derived signing key: HMAC chain over date → region →
    * service → "aws4_request" seeded with "AWS4" + secret. */
  def signingKey(secretKey: String, date: String, region: String,
      service: String): Array[Byte] = {
    val kDate = hmacSha256(("AWS4" + secretKey).getBytes(UTF_8), date)
    val kRegion = hmacSha256(kDate, region)
    val kService = hmacSha256(kRegion, service)
    hmacSha256(kService, "aws4_request")
  }

  /** Build the full `Authorization` header value for a request.
    *
    * @param headers  name → value; names are lowercased and sorted
    *                 here, values trimmed (pass each header once)
    * @param payloadSha256 lowercase hex SHA-256 of the body
    * @param amzDate  `yyyyMMdd'T'HHmmss'Z'` — must equal the
    *                 x-amz-date header the caller sends
    */
  def authorization(method: String, path: String,
      query: Seq[(String, String)], headers: Seq[(String, String)],
      payloadSha256: String, amzDate: String, region: String,
      service: String, accessKey: String, secretKey: String): String = {
    val canonicalUri = {
      val enc = uriEncode(if (path.isEmpty) "/" else path,
        encodeSlash = false)
      if (enc.startsWith("/")) enc else "/" + enc
    }
    val canonicalQuery = query
      .map { case (k, v) => (uriEncode(k, true), uriEncode(v, true)) }
      .sorted
      .map { case (k, v) => s"$k=$v" }
      .mkString("&")
    val lowered = headers
      .map { case (k, v) => (k.toLowerCase(java.util.Locale.ROOT),
        v.trim.replaceAll("  +", " ")) }
    // AWS requires repeated header names comma-joined into ONE
    // canonical line; silently emitting two lines would sign a request
    // the service canonicalizes differently (guaranteed 403)
    require(lowered.map(_._1).distinct.size == lowered.size,
      s"duplicate header names in SigV4 signing set: " +
        lowered.map(_._1).groupBy(identity).collect {
          case (k, vs) if vs.size > 1 => k }.mkString(", ") +
        " — comma-join repeated values into one entry")
    val sortedHeaders = lowered.sortBy(_._1)
    val canonicalHeaders =
      sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")
    val canonicalRequest = Seq(method, canonicalUri, canonicalQuery,
      canonicalHeaders, signedHeaders, payloadSha256).mkString("\n")
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(UTF_8))).mkString("\n")
    val signature =
      hex(hmacSha256(signingKey(secretKey, date, region, service),
        stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}
