package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {

  test("diagnosisWindow parses the last two underscore tokens of the stem (F8)") {
    assert(Ingest.diagnosisWindow("adult_cancer_survival_2017_2021.xlsx") === "2017-2021")
    assert(Ingest.diagnosisWindow("Index_file_2015_2019.xlsx") === "2015-2019")
  }

  test("snapshotDate takes words -3..-1 as Month YYYY (F9)") {
    assert(Ingest.snapshotDate(
      "Figures are based on data extracted in December 2023 snapshot")
      === Some("December 2023"))
  }

  test("snapshotDate month check is VACUOUS — faithful to the reference bug (main.py:88)") {
    // "NotAMonth" passes because the reference compares month_name[0] (empty
    // string) against the month list, which never fails.
    assert(Ingest.snapshotDate("extracted in NotAMonth 2023 snapshot")
      === Some("NotAMonth 2023"))
  }

  test("snapshotDate year gate is real: outside (2000, 2100) → None") {
    assert(Ingest.snapshotDate("extracted in December 1999 snapshot") === None)
    assert(Ingest.snapshotDate("extracted in December 2101 snapshot") === None)
    assert(Ingest.snapshotDate("extracted in December 2000 snapshot") === Some("December 2000"))
  }

  test("snapshotDate malformed input → None (caller stamps NULL)") {
    assert(Ingest.snapshotDate("too short") === None)
    assert(Ingest.snapshotDate("ends in December NaN snapshot") === None)
  }

  test("dispatch routes on filename prefix (J2)") {
    assert(Ingest.dispatch("Index_2017_2021.xlsx") === Ingest.IndexFile)
    assert(Ingest.dispatch("adult_2017_2021.xlsx") === Ingest.AdultFile)
    assert(Ingest.dispatch("readme.txt") === Ingest.UnknownFile)
  }
}
