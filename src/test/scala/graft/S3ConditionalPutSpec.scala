package graft

import java.net.InetSocketAddress
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, CyclicBarrier}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.util.{AtomicPut, S3ConditionalPut, SigV4}

/** The shippable object-store backend (r9 verdict item 8), pinned two
  * ways without egress or SDKs:
  *  1. the SigV4 math against the AWS documentation's worked example
  *     (its published canonical-request hash AND final signature);
  *  2. the full HTTP round-trip against an in-process JDK HttpServer
  *     that implements the S3 conditional-PUT contract — atomic
  *     If-None-Match: * arbitration, 412 on loss, server-side SigV4
  *     re-verification of exactly the headers the adapter signs —
  *     running the same race assertions as the MockStoreSpec contract
  *     suite, plus end-to-end through AtomicPut's scheme gate. */
class S3ConditionalPutSpec extends AnyFunSuite {

  private val AK = "AKIDEXAMPLE"
  private val SK = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val REGION = "us-east-1"

  test("SigV4 reproduces the AWS documentation example signature") {
    val headers = Seq(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> "20150830T123600Z")
    val auth = SigV4.authorization(
      method = "GET", path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = headers,
      payloadSha256 = SigV4.sha256Hex(Array.emptyByteArray),
      amzDate = "20150830T123600Z", region = "us-east-1",
      service = "iam", accessKey = AK, secretKey = SK)
    assert(auth == "AWS4-HMAC-SHA256 " +
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, " +
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    // the empty-body hash is the documented constant
    assert(SigV4.sha256Hex(Array.emptyByteArray) ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("SigV4 matches an independent implementation of the published " +
      "algorithm across methods, encodings, unicode and token headers") {
    // expected values computed by a from-scratch Python hmac/hashlib
    // implementation of the same AWS-documented algorithm — a
    // cross-implementation check, so a Scala-side bug in encoding,
    // header sorting, or the HMAC chain can't self-confirm
    def sig(m: String, p: String, q: Seq[(String, String)],
        h: Seq[(String, String)], body: Array[Byte], d: String,
        r: String, svc: String): String =
      SigV4.authorization(m, p, q, h, SigV4.sha256Hex(body), d, r,
        svc, AK, SK)
    val bodySha = SigV4.sha256Hex("body".getBytes("UTF-8"))
    assert(sig("PUT", "/bkt/warehouse/_catalog/000042", Nil,
      Seq("host" -> "s3.local:9000", "if-none-match" -> "*",
        "x-amz-content-sha256" -> bodySha,
        "x-amz-date" -> "20260816T040000Z"),
      "body".getBytes("UTF-8"), "20260816T040000Z", "us-east-1", "s3")
      .endsWith("Signature=9879bd94b49cdbc5451101e1ff015931cb5992bf166996894a6ab1b0090a1809"))
    assert(sig("GET", "/bkt/key with spaces+plus",
      Seq("list-type" -> "2", "prefix" -> "a/b c"),
      Seq("host" -> "example.com", "x-amz-date" -> "20260101T000000Z"),
      Array.emptyByteArray, "20260101T000000Z", "eu-west-1", "s3")
      .endsWith("Signature=4827f3de68615693ae94911cd49300954a70cbe19372a1892e9a373736506dc5"))
    assert(sig("POST", "/",
      Seq("Action" -> "Test", "Zed" -> "last", "aaa" -> "first"),
      Seq("host" -> "svc.amazonaws.com",
        "content-type" -> "application/json",
        "x-amz-date" -> "20250630T235959Z"),
      """{"k":1}""".getBytes("UTF-8"), "20250630T235959Z",
      "ap-southeast-2", "sts")
      .endsWith("Signature=6bdfe37ba44f07938f42d20aaeaaac13f96ea8cfb24ac2edbfe93b0ad29e2300"))
    assert(sig("PUT", "/b/unicode-é中", Nil,
      Seq("host" -> "h", "x-amz-date" -> "20260816T000000Z"),
      Array.tabulate(256)(_.toByte), "20260816T000000Z",
      "us-west-2", "s3")
      .endsWith("Signature=ae3419c08b6759ec58c72526a48dec7ea7aeb36208277d7f830b1e781ab158ae"))
    assert(sig("DELETE", "/b/k~tilde-._", Seq("versionId" -> "abc%3D"),
      Seq("host" -> "h:8443", "x-amz-date" -> "20260201T120000Z",
        "x-amz-security-token" -> "tok/+="),
      Array.emptyByteArray, "20260201T120000Z", "us-east-2", "s3")
      .endsWith("Signature=be6ed30f9255464286d48a780b43c2606cda7b14d612ac260e002d0caaabf48f"))
  }

  test("duplicate header names are rejected, not silently mis-signed " +
      "(AWS canonicalizes repeats into ONE comma-joined line)") {
    val ex = intercept[IllegalArgumentException] {
      SigV4.authorization(
        method = "GET", path = "/", query = Nil,
        headers = Seq("host" -> "a.example", "Host" -> "b.example",
          "x-amz-date" -> "20150830T123600Z"),
        payloadSha256 = SigV4.sha256Hex(Array.emptyByteArray),
        amzDate = "20150830T123600Z", region = REGION,
        service = "s3", accessKey = AK, secretKey = SK)
    }
    assert(ex.getMessage.contains("host"))
  }

  test("uriEncode follows the AWS rules") {
    assert(SigV4.uriEncode("a/b c+d~e", encodeSlash = false) ==
      "a/b%20c%2Bd~e")
    assert(SigV4.uriEncode("a/b", encodeSlash = true) == "a%2Fb")
    assert(SigV4.uriEncode("\u00e9", encodeSlash = true) == "%C3%A9")
  }

  /** In-process S3-shaped HTTP store: atomic conditional PUT, 412 on
    * loss, 403 unless the adapter's SigV4 signature re-verifies over
    * the request as RECEIVED, 400 if the body hash header lies. */
  private def withServer(requireAuth: Boolean)(
      run: (String, ConcurrentHashMap[String, Array[Byte]]) => Unit): Unit = {
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    server.createContext("/", (x: HttpExchange) => {
      try handle(x, store, requireAuth)
      finally x.close()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", store)
    finally server.stop(0)
  }

  private def handle(x: HttpExchange,
      store: ConcurrentHashMap[String, Array[Byte]],
      requireAuth: Boolean): Unit = {
    def respond(code: Int): Unit = {
      x.sendResponseHeaders(code, -1)
    }
    if (x.getRequestMethod != "PUT") { respond(405); return }
    val body = x.getRequestBody.readAllBytes()
    val h = x.getRequestHeaders
    val sha = Option(h.getFirst("x-amz-content-sha256")).getOrElse("")
    if (sha != SigV4.sha256Hex(body)) { respond(400); return }
    if (requireAuth) {
      val auth = Option(h.getFirst("Authorization")).getOrElse("")
      if (auth.isEmpty) { respond(403); return }
      // re-verify over the request AS RECEIVED: reconstruct from the
      // SignedHeaders list the client claims, with this server's view
      // of each header value — any sign/send mismatch breaks it
      val signedNames = auth.split("SignedHeaders=")(1).split(",")(0)
        .split(";").toSeq
      val signedHeaders = signedNames.map(n => n -> h.getFirst(n))
      val amzDate = h.getFirst("x-amz-date")
      val expected = SigV4.authorization("PUT",
        x.getRequestURI.getPath, Nil, signedHeaders, sha, amzDate,
        REGION, "s3", AK, SK)
      if (auth != expected) { respond(403); return }
    }
    if (Option(h.getFirst("If-None-Match")).contains("*")) {
      val key = x.getRequestURI.getPath.stripPrefix("/")
      if (store.putIfAbsent(key, body) == null) respond(200)
      else respond(412)
    } else respond(501) // this store only serves the conditional write
  }

  test("signed conditional PUT end to end: create wins, duplicate " +
      "loses with 412, bad credentials refuse, content is whole") {
    withServer(requireAuth = true) { (endpoint, store) =>
      val put = new S3ConditionalPut(endpoint, REGION, AK, SK)
      val p = new Path("s3a://bkt/warehouse/_catalog/000042")
      assert(put.putIfNoneMatch(p, "hello-graft".getBytes("UTF-8")))
      assert(!put.putIfNoneMatch(p, "other".getBytes("UTF-8")))
      assert(new String(store.get("bkt/warehouse/_catalog/000042"),
        "UTF-8") == "hello-graft")
      // wrong secret → 403 → IOException, never a silent "lost"
      val bad = new S3ConditionalPut(endpoint, REGION, AK, "wrong")
      val e = intercept[java.io.IOException] {
        bad.putIfNoneMatch(new Path("s3a://bkt/x"), Array[Byte](1))
      }
      assert(e.getMessage.contains("403"), e.getMessage)
    }
  }

  test("race contract: exactly one of 8 racing signed writers wins " +
      "each of 40 rounds; losers see the conditional loss; the object " +
      "is the winner's whole body") {
    withServer(requireAuth = true) { (endpoint, store) =>
      val put = new S3ConditionalPut(endpoint, REGION, AK, SK)
      val writers = 8
      (0 until 40).foreach { round =>
        val p = new Path(s"s3a://race/obj-$round")
        val barrier = new CyclicBarrier(writers)
        val won = new ConcurrentLinkedQueue[Int]()
        val threads = (0 until writers).map { i =>
          new Thread(() => {
            barrier.await()
            if (put.putIfNoneMatch(p, (s"w$i-" * 64).getBytes("UTF-8")))
              won.add(i)
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        assert(won.size == 1, s"round $round: winners=${won.size}")
        val body = new String(store.get(s"race/obj-$round"), "UTF-8")
        assert(body == s"w${won.peek()}-" * 64,
          s"round $round: torn or foreign content")
      }
    }
  }

  test("registers as an AtomicPut backend: putIfAbsent through the " +
      "scheme gate creates once then throws FileAlreadyExists") {
    withServer(requireAuth = true) { (endpoint, _) =>
      val conf = new org.apache.hadoop.conf.Configuration()
      conf.set("fs.mock3a.impl", classOf[MockS3FileSystem].getName)
      val fs = FileSystem.get(new java.net.URI("mock3a://gatebkt/"), conf)
      AtomicPut.register("mock3a",
        new S3ConditionalPut(endpoint, REGION, AK, SK))
      try {
        val p = new Path("mock3a://gatebkt/manifest/v1")
        AtomicPut.putIfAbsent(fs, p, "m1")
        intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
          AtomicPut.putIfAbsent(fs, p, "m2")
        }
      } finally AtomicPut.unregister("mock3a")
    }
  }

  test("5xx is an IOException, not a loss — an outage can't be " +
      "mistaken for losing the race") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      x.getRequestBody.readAllBytes()
      x.sendResponseHeaders(503, -1); x.close()
    })
    server.start()
    try {
      val put = new S3ConditionalPut(
        s"http://127.0.0.1:${server.getAddress.getPort}", REGION, AK, SK)
      val e = intercept[java.io.IOException] {
        put.putIfNoneMatch(new Path("s3a://b/k"), Array[Byte](1, 2))
      }
      assert(e.getMessage.contains("503"), e.getMessage)
    } finally server.stop(0)
  }
}
