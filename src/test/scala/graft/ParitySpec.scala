package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** SURVEY §5.2.1 — the oracle-parity harness: run every declared query at
  * sf0.001 and compare row-for-row against DuckDB executing the declared
  * oracleSql (via tools/parity.py). Skips (cancels) when the local
  * python3/duckdb tooling is absent — the shipped library has no python
  * dependency; this is the dev mirror of the driver's t2 gate. */
class ParitySpec extends AnyFunSuite {

  private def duckdbAvailable: Boolean =
    scala.util.Try(
      Seq("python3", "-c", "import duckdb, pyarrow").! == 0).getOrElse(false)

  test("every declared oracle query hash-matches DuckDB at sf0.001") {
    assume(duckdbAvailable, "python3+duckdb not available — skipping dev parity")
    val out = java.nio.file.Files.createTempDirectory("graft_parity_").toString
    val failed = Verify.dump(TestSpark.spark, "/root/testdata/sf0.001", out)
    assert(failed.isEmpty, s"queries failed to run: $failed")
    val log = new StringBuilder
    val code = Seq("python3", "tools/parity.py", "/root/testdata/sf0.001", out)
      .!(ProcessLogger(l => log.append(l).append('\n')))
    assert(code === 0, "parity mismatches:\n" + log.result())
  }
}
