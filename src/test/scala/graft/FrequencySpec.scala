package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.time.{Calendar, FreqClass, Frequency}

class FrequencySpec extends AnyFunSuite {

  test("parse/print round-trips the reference's valid token sets") {
    val months = Frequency.MONTHS
    val yearly = Seq("YE", "BYE", "YS", "BYS")
    val quarterly = Seq("QE", "BQE", "QS", "BQS")
    for (b <- yearly ++ quarterly; m <- months) {
      val f = Frequency.parse(s"$b-$m")
      assert(f.isDefined, s"$b-$m should parse")
      assert(f.get.name == s"$b-$m")
    }
    for (b <- Seq("ME", "MS", "BME", "BMS")) {
      val f = Frequency.parse(b)
      assert(f.isDefined && f.get.name == b)
    }
    // bare Y/Q aliases print with pandas default anchors
    assert(Frequency.parse("YS").get.name == "YS-JAN")
    assert(Frequency.parse("YE").get.name == "YE-DEC")
    assert(Frequency.parse("QS").get.name == "QS-JAN")
    assert(Frequency.parse("QE").get.name == "QE-DEC")
    assert(Frequency.parse("MS-JAN").isEmpty) // monthly takes no anchor
    assert(Frequency.parse("W").isEmpty)
  }

  test("step-down: Y->Q keeps anchor, Q->M drops it (time_conversion.py:85-104)") {
    assert(Frequency.parseValidated("YS-JAN").stepDown.name == "QS-JAN")
    assert(Frequency.parseValidated("YE-OCT").stepDown.name == "QE-OCT")
    assert(Frequency.parseValidated("BYS-MAR").stepDown.name == "BQS-MAR")
    assert(Frequency.parseValidated("QS-OCT").stepDown.name == "MS")
    assert(Frequency.parseValidated("BQE-NOV").stepDown.name == "BME")
    assertThrows[UnsupportedOperationException](Frequency.parseValidated("MS").stepDown)
  }

  test("conversion factors (time_conversion.py:30-33)") {
    def f(a: String, b: String) =
      Frequency.parseValidated(a).factorTo(Frequency.parseValidated(b))
    assert(f("YS", "QS") == Some(4))
    assert(f("YS", "MS") == Some(12))
    assert(f("QS", "MS") == Some(3))
    assert(f("MS", "QS") == None) // downsampling unsupported
    assert(f("YS", "YS") == None)
  }

  test("inference mirrors pandas inferred_freq on the fixture families") {
    def dates(start: String, stepMonths: Int, n: Int): IndexedSeq[LocalDate] = {
      val s = LocalDate.parse(start)
      (0 until n).map(i => s.plusMonths((i * stepMonths).toLong))
    }
    // exports_q: Jan/Apr/Jul/Oct starts -> QS-OCT (pandas quirk, pinned by
    // tests/test_disaggregation.py:304)
    assert(Frequency.infer(dates("1972-01-01", 3, 8)).map(_.name) == Some("QS-OCT"))
    assert(Frequency.infer(dates("1995-03-01", 3, 8)).map(_.name) == Some("QS-DEC"))
    assert(Frequency.infer(dates("1995-02-01", 3, 8)).map(_.name) == Some("QS-NOV"))
    assert(Frequency.infer(dates("1975-01-01", 12, 5)).map(_.name) == Some("YS-JAN"))
    assert(Frequency.infer(dates("1995-12-01", 12, 5)).map(_.name) == Some("YS-DEC"))
    assert(Frequency.infer(dates("1972-01-01", 1, 5)).map(_.name) == Some("MS"))
    // month-end family
    val me = (0 until 6).map(i => LocalDate.parse("2020-01-31").plusMonths(i.toLong)
      .withDayOfMonth(1).plusMonths(1).minusDays(1))
    assert(Frequency.infer(me).map(_.name) == Some("ME"))
    // irregular -> None
    assert(Frequency.infer(IndexedSeq(
      LocalDate.parse("2020-01-01"), LocalDate.parse("2020-03-04"),
      LocalDate.parse("2020-12-06"))) == None)
  }

  test("inference recognizes business-calendar runs (BMS/BME)") {
    // generate via the printer/generator itself, then round-trip through infer
    for (tok <- Seq("BMS", "BME", "BQS-JAN", "BYS-MAR")) {
      val f = Frequency.parseValidated(tok)
      val run = f.nDatesFrom(LocalDate.parse("2019-05-07"), 8)
      val inferred = Frequency.infer(run)
      assert(inferred.isDefined, s"$tok run should infer: $run")
      assert(inferred.get.cls == f.cls && inferred.get.isStart == f.isStart,
        s"$tok inferred ${inferred.get.name}")
      // a run where every month-edge lands on a weekday is indistinguishable
      // from the non-business alias (pandas behaves the same); business must
      // be inferred exactly when some date is weekend-shifted
      val shifted =
        if (f.isStart) run.exists(_.getDayOfMonth != 1)
        else run.exists(d => d.getDayOfMonth != java.time.YearMonth.from(d).lengthOfMonth)
      assert(inferred.get.business == shifted, s"$tok: business=$shifted expected")
    }
    // a plain first-of-month run must NOT look like business
    val ms = Frequency.parseValidated("MS").nDatesFrom(LocalDate.parse("2019-05-01"), 6)
    assert(Frequency.infer(ms).map(_.name) == Some("MS"))
  }

  test("date ranges: anchored quarters and month-ends") {
    val qs = Frequency.parseValidated("QS-OCT")
    val r = qs.dateRange(LocalDate.parse("1975-01-01"), LocalDate.parse("1975-12-31"))
    assert(r == IndexedSeq("1975-01-01", "1975-04-01", "1975-07-01", "1975-10-01")
      .map(LocalDate.parse))
    val me = Frequency.parseValidated("ME")
    val r2 = me.dateRange(LocalDate.parse("2020-01-15"), LocalDate.parse("2020-04-30"))
    assert(r2 == IndexedSeq("2020-01-31", "2020-02-29", "2020-03-31", "2020-04-30")
      .map(LocalDate.parse))
  }

  test("companion index: start-anchored extends end, end-anchored extends start") {
    val lowS = (0 until 3).map(i => LocalDate.parse("1975-01-01").plusYears(i.toLong))
    val idxS = Calendar.companionIndex(lowS, Frequency.parseValidated("YS-JAN"),
      Frequency.parseValidated("QS-JAN"))
    assert(idxS.length == 12)
    assert(idxS.head == LocalDate.parse("1975-01-01"))
    assert(idxS.last == LocalDate.parse("1977-10-01"))

    val lowE = (0 until 3).map(i => LocalDate.parse("1975-12-31").plusYears(i.toLong))
    val idxE = Calendar.companionIndex(lowE, Frequency.parseValidated("YE-DEC"),
      Frequency.parseValidated("QE-DEC"))
    assert(idxE.length == 12)
    assert(idxE.head == LocalDate.parse("1975-03-31"))
    assert(idxE.last == LocalDate.parse("1977-12-31"))
  }

  test("business adjust snaps to first/last weekday (time_conversion.py:168-200)") {
    // 2020-02-01 is a Saturday -> first business day is Mon 2020-02-03
    assert(Calendar.businessAdjust(LocalDate.parse("2020-02-15"), adjustForward = false)
      == LocalDate.parse("2020-02-03"))
    // 2020-05-31 is a Sunday -> last business day is Fri 2020-05-29
    assert(Calendar.businessAdjust(LocalDate.parse("2020-05-15"), adjustForward = true)
      == LocalDate.parse("2020-05-29"))
    // century leap rule is the correct Gregorian one (java.time), unlike the
    // reference's year%4 (SURVEY.md §1.4): Feb 1900 had 28 days
    assert(Calendar.businessAdjust(LocalDate.parse("1900-02-10"), adjustForward = true)
      == LocalDate.parse("1900-02-28"))
  }
}
