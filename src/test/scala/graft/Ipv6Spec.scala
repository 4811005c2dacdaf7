package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ipv6Util

/** [[Ipv6Util.parse]] hardening: property-check the pure parser against the
  * JDK's literal IPv6 parser (`InetAddress.getByName` on a literal never
  * resolves DNS — safe in a TEST; the production parser avoids it because
  * row VALUES are not guaranteed literals). Pure JVM suite — no Spark.
  */
class Ipv6Spec extends AnyFunSuite {

  private def jdkBytes(s: String): Option[Array[Byte]] =
    scala.util.Try(java.net.InetAddress.getByName(s)).toOption.collect {
      case i: java.net.Inet6Address => i.getAddress
      // the JDK collapses IPv4-MAPPED literals (::ffff:a.b.c.d) to
      // Inet4Address — reconstruct the 128-bit mapped form
      case i: java.net.Inet4Address =>
        Array.fill[Byte](10)(0) ++
          Array(0xff.toByte, 0xff.toByte) ++ i.getAddress
    }

  private def toHalves(b: Array[Byte]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    for (i <- 0 until 8) hi = (hi << 8) | (b(i) & 0xffL)
    for (i <- 8 until 16) lo = (lo << 8) | (b(i) & 0xffL)
    (hi, lo)
  }

  private val group: Gen[String] =
    Gen.chooseNum(0, 0xffff).map(_.toHexString)

  /** full 8-group literals */
  private val fullForm: Gen[String] =
    Gen.listOfN(8, group).map(_.mkString(":"))

  /** compressed `::` literals: left and right parts totalling ≤ 7 groups */
  private val compressed: Gen[String] = for {
    nl <- Gen.chooseNum(0, 7)
    nr <- Gen.chooseNum(0, 7 - nl)
    l <- Gen.listOfN(nl, group)
    r <- Gen.listOfN(nr, group)
  } yield l.mkString(":") + "::" + r.mkString(":")

  /** trailing embedded IPv4 (6 hex groups + dotted quad) */
  private val embedded: Gen[String] = for {
    gs <- Gen.listOfN(6, group)
    q <- Gen.listOfN(4, Gen.chooseNum(0, 255))
  } yield gs.mkString(":") + ":" + q.mkString(".")

  private def checkAgree(g: Gen[String]): Unit = {
    val prop: Prop = forAll(g) { s =>
      val ours = Option(Ipv6Util.parse(s)).map(p => (p(0), p(1)))
      val jdk = jdkBytes(s).map(toHalves)
      ours == jdk
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("parse agrees with the JDK literal parser on full forms") {
    checkAgree(fullForm)
  }

  test("parse agrees with the JDK literal parser on :: compressed forms") {
    checkAgree(compressed)
  }

  test("parse agrees with the JDK literal parser on embedded-IPv4 forms") {
    checkAgree(embedded)
  }

  test("malformed forms parse to null (and never throw)") {
    for (bad <- Seq("", ":", ":::", "1:2", "1:2:3:4:5:6:7", "g::1",
        "1:2:3:4:5:6:7:8:9", "12345::", "1.2.3.4", "::ffff:1.2.3.256",
        "::ffff:1.2.3", "fe80::1%eth0", "1::2::3", "1:2:3:4:5:6:7::8",
        "::ffff:01.2.3.4"))
      assert(Ipv6Util.parse(bad) == null, s"'$bad' should not parse")
  }

  test("masks: prefix edges partition the bit range") {
    assert(Ipv6Util.masks(0) == (0L, 0L))
    assert(Ipv6Util.masks(64) == (-1L, 0L))
    assert(Ipv6Util.masks(128) == (-1L, -1L))
    assert(Ipv6Util.masks(1) == (Long.MinValue, 0L))
    assert(Ipv6Util.masks(65) == (-1L, Long.MinValue))
    intercept[IllegalArgumentException](Ipv6Util.masks(129))
  }
}
