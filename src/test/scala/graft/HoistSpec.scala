package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Hoist

/** Literal hoisting per tools/Hoist.java + HoistTest expectations. */
class HoistSpec extends AnyFunSuite {

  test("literals become ordinal bind variables") {
    val h = Hoist.hoist("select 1 as x, 'ab' as y from t where n = 2.5 and s = 'x''") 
    // note: trailing quote imbalance tolerated by the masker; use a clean one
    val h2 = Hoist.hoist("select 1 as x, 'ab' as y from emp where deptno = 2.5")
    assert(h2.toString == "select ?0 as x, ?1 as y from emp where deptno = ?2")
    assert(h2.variables.map(_.sql) == Seq("1", "'ab'", "2.5"))
    assert(h != null)
  }

  test("identifiers with digits and qualified names are not literals") {
    val h = Hoist.hoist("select c1, t2.x from t2 where a_3 = 7")
    assert(h.toString == "select c1, t2.x from t2 where a_3 = ?0")
  }

  test("keywords inside strings stay untouched; custom substitution") {
    val h = Hoist.hoist("select 'from 1 where' from t where x = 10")
    assert(h.variables.map(_.sql) == Seq("'from 1 where'", "10"))
    val custom = h.substitute(v => s":p${v.ordinal}")
    assert(custom == "select :p0 from t where x = :p1")
  }

  test("scientific notation hoists as one literal") {
    val h = Hoist.hoist("select 1e3 + 2.5E-2 from t")
    assert(h.variables.map(_.sql) == Seq("1e3", "2.5E-2"))
  }
}
