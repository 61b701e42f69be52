package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Base32, SimilarTo}

/** ScalaCheck identities for the pure expression kernels (adopted per
  * SURVEY.md §5(6) — the reference has no property tests; these cover
  * our translators where exhaustive tables can't). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  test("similar_to: a literal alphanumeric pattern matches itself and only itself") {
    check(Prop.forAll(word, word) { (a, b) =>
      val self = SimilarTo.compiled(a).matcher(a).matches()
      val other = SimilarTo.compiled(a).matcher(b).matches() == (a == b)
      self && other
    })
  }

  test("similar_to: %infix% finds substrings, anchors still hold") {
    check(Prop.forAll(word, word, word) { (pre, mid, post) =>
      val s = pre + mid + post
      SimilarTo.compiled(s"%$mid%").matcher(s).matches() &&
        SimilarTo.compiled(mid).matcher(s).matches() == (s == mid)
    })
  }

  test("similar_to: underscore matches exactly one character") {
    check(Prop.forAll(word) { w =>
      val pattern = "_" * w.length
      SimilarTo.compiled(pattern).matcher(w).matches() &&
        !SimilarTo.compiled("_" * (w.length + 1)).matcher(w).matches()
    })
  }

  test("base32: decode∘encode is identity on arbitrary bytes") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      val arr = bs.toArray
      java.util.Arrays.equals(Base32.decode(Base32.encode(arr)), arr)
    })
  }

  test("base32: output alphabet is RFC 4648") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      Base32.encode(bs.toArray).forall(c => c == '=' || (c >= 'A' && c <= 'Z') || (c >= '2' && c <= '7'))
    })
  }

  test("multiset intersect/except ALL: model equivalence on random bags") {
    val bag: Gen[List[String]] = Gen.listOf(Gen.oneOf("a", "b", "c", "d"))
    def modelIntersect(l: List[String], r: List[String]): Map[String, Int] = {
      val lc = l.groupBy(identity).view.mapValues(_.size)
      val rc = r.groupBy(identity).view.mapValues(_.size).toMap
      lc.map { case (k, n) => k -> math.min(n, rc.getOrElse(k, 0)) }
        .filter(_._2 > 0).toMap
    }
    def modelExcept(l: List[String], r: List[String]): Map[String, Int] = {
      val rc = r.groupBy(identity).view.mapValues(_.size).toMap
      l.groupBy(identity).view.mapValues(_.size)
        .map { case (k, n) => k -> math.max(n - rc.getOrElse(k, 0), 0) }
        .filter(_._2 > 0).toMap
    }
    def evalOp(op: (org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression,
        l: List[String], r: List[String]): Map[String, Int] = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types._
      val e = op(
        Literal.create(l, ArrayType(StringType)),
        Literal.create(r, ArrayType(StringType)))
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType).map(_.toString)
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    check(Prop.forAll(bag, bag) { (l, r) =>
      evalOp(graft.functions.MultisetIntersectAll.apply, l, r) == modelIntersect(l, r) &&
        evalOp(graft.functions.MultisetExceptAll.apply, l, r) == modelExcept(l, r)
    })
  }

  test("match pattern parser round-trips quantifier grammar without error") {
    val sym = Gen.oneOf("A", "B", "CC", "D1")
    val quant = Gen.oneOf("", "*", "+", "?", "{2}", "{1,3}", "{2,}")
    val atom = Gen.zip(sym, quant).map { case (s, q) => s + q }
    val pat = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, atom).map(_.mkString(" ")))
    check(Prop.forAll(pat) { p =>
      graft.plans.MatchRecognize.parsePattern(p) != null
    })
  }
}
