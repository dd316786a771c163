package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle TYPE lint: every `SparkEntry.oracleSql` entry is DuckDB-
  * `DESCRIBE`d (planned, not executed) against the canonical test
  * tables and any final projection column typed HUGEINT/UHUGEINT
  * fails the build. That type reaches pandas as float64 while Spark
  * emits int64, so the driver's hasher goes red even when every value
  * matches — the q170_ivm_from_cdf bug class, which the dev mimic's
  * `%.17g` canonicalization used to mask for two whole rounds. The
  * fix is always `cast(sum(x) as bigint)` in the oracle's final
  * projection (the convention every sibling oracle follows).
  *
  * Needs python3 + duckdb (present in the dev container; the spec is
  * cancelled, loudly, where they are not) and the driver-generated
  * testdata for view binding. */
class OracleTypeLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("no oracle final projection is HUGEINT (DuckDB->pandas float64 drift)") {
    assume(Files.exists(Paths.get(sfDir)), s"testdata missing: $sfDir")
    val duck = Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()))
    assume(duck == 0, "python3+duckdb unavailable — oracle type lint skipped")

    val json = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(json, Verify.toJson(SparkEntry.oracleSql))
    val out = new StringBuilder
    val code = Process(
      Seq("python3", "tools/lint_oracle_types.py", sfDir, json.toString),
      new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"oracle type lint failed:\n$out")
  }
}
