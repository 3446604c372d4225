package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll
import org.scalacheck.{Test => SCTest}

class NormalizeSpec extends AnyFunSuite {

  test("basic lowering / space and symbol handling") {
    assert(Normalize.columnNames(Seq("Name ", "Émail Address", "Status")) ==
      Seq("name", "email address", "status"))
  }

  test("duplicate names fall back to col_<index+1> (1-based)") {
    assert(Normalize.columnNames(Seq("Status", "Status")) == Seq("status", "col_2"))
  }

  test("non-letter start gets underscore prefix; symbol-only becomes _") {
    assert(Normalize.columnNames(Seq("2019 total")) == Seq("_2019 total"))
    // "#" strips to empty, then gets the `_` prefix — NOT the col_N fallback
    // (the reference's empty-check runs after prefixing and never fires)
    assert(Normalize.columnNames(Seq("#")) == Seq("_"))
    assert(Normalize.columnNames(Seq("#", "!")) == Seq("_", "col_2"))
  }

  test("col_N-shaped inputs are rejected to the fallback") {
    assert(Normalize.columnNames(Seq("col_7")) == Seq("col_1"))
    assert(Normalize.columnNames(Seq("a", "col_1")) == Seq("a", "col_2"))
  }

  test("transliteration strips accents, drops non-ASCII remainder") {
    assert(Normalize.columnNames(Seq("Ünïcôdé")) == Seq("unicode"))
    assert(Normalize.columnNames(Seq("日本語")) == Seq("_"))
  }

  test("underscore allowed as first char; existing underscores kept") {
    assert(Normalize.columnNames(Seq("_hidden", "a_b")) == Seq("_hidden", "a_b"))
  }

  test("order dependence: fallback collides forward only") {
    // first "b" keeps the name; second becomes col_3
    assert(Normalize.columnNames(Seq("a", "b", "b")) == Seq("a", "b", "col_3"))
  }

  test("property: total, unique, valid identifier shape") {
    val prop = forAll { (names: List[String]) =>
      val out = Normalize.columnNames(names)
      out.size == names.size &&
      out.distinct.size == out.size &&
      out.forall(_.matches("^[a-z_][a-z0-9_ ]*$"))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
