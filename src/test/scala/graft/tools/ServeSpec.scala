package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument parsing for the standalone server entrypoint. */
class ServeSpec extends AnyFunSuite {

  test("metrics= parses PORT and HOST:PORT, defaults the bind host to loopback") {
    assert(Serve.parseMetricsArg("9090") == ("127.0.0.1", 9090))
    assert(Serve.parseMetricsArg("0") == ("127.0.0.1", 0))
    assert(Serve.parseMetricsArg("0.0.0.0:9090") == ("0.0.0.0", 9090))
    assert(Serve.parseMetricsArg("example.internal:9090") == ("example.internal", 9090))
    assert(Serve.parseMetricsArg("[::1]:9090") == ("::1", 9090))
    assert(Serve.parseMetricsArg("[fe80::2]:80") == ("fe80::2", 80))
  }

  test("metrics= rejects unbracketed IPv6 and malformed values with the usage error") {
    // '::1' would otherwise split on the LAST colon into host ":" and
    // port "1", pass validation, and die much later with an opaque
    // UnknownHostException (round-8 ADVICE)
    for (bad <- Seq("::1", "fe80::2:80", "host:", ":9090", "host:port", "", "x")) {
      val e = intercept[IllegalArgumentException](Serve.parseMetricsArg(bad))
      assert(e.getMessage.contains("metrics= expects"), s"value '$bad': ${e.getMessage}")
    }
  }
}
