package graft.expr

import org.scalatest.funsuite.AnyFunSuite

class SentenceSpec extends AnyFunSuite {

  private def s(t: String) = SentenceOps.split(t)

  test("boundaries: capital/digit confirmation, trailing tail, runs") {
    assert(s("One two. Three four! Five?") ===
      Seq("One two.", "Three four!", "Five?"))
    assert(s("Version 2 shipped. 3 bugs remain.") ===
      Seq("Version 2 shipped.", "3 bugs remain."))
    // lowercase after the period: no boundary (mid-sentence dot)
    assert(s("pi is 3.14 roughly. Next one.") ===
      Seq("pi is 3.14 roughly.", "Next one."))
    assert(s("no terminator at all") === Seq("no terminator at all"))
    assert(s("Wait... Really?! Yes..") === Seq("Wait...", "Really?!", "Yes.."))
  }

  test("abbreviation guard: single period only, list-driven") {
    assert(s("Dr. Smith agreed. Mrs. Jones did not.") ===
      Seq("Dr. Smith agreed.", "Mrs. Jones did not."))
    assert(s("See fig. 3 for detail. Done.") ===
      Seq("See fig. 3 for detail.", "Done."))
    // a '..' run after an abbreviation is a hard stop regardless
    assert(s("Ask Dr.. Then leave.") === Seq("Ask Dr..", "Then leave."))
    // non-abbreviation word + period + capital splits
    assert(s("It was cold. Winter came.") ===
      Seq("It was cold.", "Winter came."))
  }

  test("edges: empty, null, whitespace, terminator at end") {
    assert(s("") === Nil)
    assert(SentenceOps.split(null) === Nil)
    assert(s("   ") === Nil)
    assert(s("Just one sentence.") === Seq("Just one sentence."))
    assert(s("A. B. C.") === Seq("A.", "B.", "C."))
  }
}
