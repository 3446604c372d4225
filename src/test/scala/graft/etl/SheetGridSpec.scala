package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll
import org.scalacheck.{Test => SCTest}

/** FIXTURES.md §1 grid + reference src/RowsOfColumns.php semantics. */
class SheetGridSpec extends AnyFunSuite {

  private val fixtureValues = Seq(
    Seq("Name ", "Émail Address", "Status", "Status", "#"),
    Seq("Alice", " alice@example.com", "DONE", "x"),
    Seq("Bob", "bob@example.com"),
    Seq("", "  ", "active", "y", "7"))

  private val grid = SheetGrid.fromValues(fixtureValues)

  test("cells are trimmed at construction") {
    assert(grid.rows(0)(0) == "Name")
    assert(grid.rows(1)(1) == "alice@example.com")
    assert(grid.rows(3)(1) == "")
  }

  test("header resolution: exact, case-sensitive, first-match-wins") {
    val sel = grid.columnSelectorsFromHeaderRow(
      Seq(Right("Name"), Right("Émail Address"), Left(3)))
    assert(sel == Seq(0, 1, 3))
    // duplicate header "Status": first match wins
    assert(grid.columnSelectorsFromHeaderRow(Seq(Right("Status"))) == Seq(2))
    // case-sensitive: lowercase lookup fails
    val e = intercept[IllegalArgumentException] {
      grid.columnSelectorsFromHeaderRow(Seq(Right("status")))
    }
    assert(e.getMessage == "Required column not found: status")
  }

  test("index out of bounds error contract") {
    val e = intercept[IllegalArgumentException] {
      grid.columnSelectorsFromHeaderRow(Seq(Left(5)))
    }
    assert(e.getMessage == "Column index out of bounds: 5")
  }

  test("empty sheet / headerRow past the grid is a contract error") {
    val empty = SheetGrid.fromValues(Seq.empty)
    val e = intercept[IllegalArgumentException] {
      empty.columnSelectorsFromHeaderRow(Seq(Right("Name")))
    }
    assert(e.getMessage == "Header row 0 out of bounds (grid has 0 row(s))")
    val e2 = intercept[IllegalArgumentException] {
      grid.columnSelectorsFromHeaderRow(Seq(Right("Name")), headerRow = 99)
    }
    assert(e2.getMessage.contains("Header row 99 out of bounds"))
  }

  test("projection null-pads ragged rows; skipRows re-bases to 0") {
    val rows = grid.toRows(Seq(0, 1, 3), skipRows = 1)
    assert(rows == Vector(
      Vector(Some("Alice"), Some("alice@example.com"), Some("x")),
      Vector(Some("Bob"), Some("bob@example.com"), None),
      Vector(Some(""), Some(""), Some("y"))))
  }

  test("hash is over the RAW grid and is change-sensitive") {
    val same = SheetGrid.fromValues(fixtureValues)
    assert(same.hash == grid.hash)
    val mutated = SheetGrid.fromValues(
      fixtureValues.updated(1, Seq("Alice2", "alice@example.com", "DONE", "x")))
    assert(mutated.hash != grid.hash)
    // trimming happens after hashing: raw whitespace affects the hash
    val untrimmed = SheetGrid.fromValues(
      fixtureValues.updated(1, Seq("Alice ", " alice@example.com", "DONE", "x")))
    assert(untrimmed.hash != grid.hash)
    assert(untrimmed.rows(1)(0) == "Alice")
  }

  test("property: projection is total on ragged input") {
    val prop = forAll { (rows: List[List[String]], skip: Byte) =>
      val g = SheetGrid.fromValues(rows)
      val out = g.toRows(Seq(0, 2, 7), math.abs(skip.toInt))
      out.forall(_.size == 3)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
