package graft.operators

import org.apache.spark.sql.DataFrame

/** Size guard for driver-side dictionary builds.
  *
  * The broadcast dictionary layouts (flat/hashed/range_hashed/
  * complex_key_hashed) collect their source to the driver — correct
  * under the reference's contract that dictionaries are small config
  * tables (dbms/src/Dictionaries/ are all fully-materialized in-memory
  * layouts), but a user pointing one at a fact table would OOM the
  * driver with an opaque heap error. This bounds the collect: fetch at
  * most `MaxRows + 1` rows and fail with a named, actionable error
  * when the source exceeds the bound. */
object DictGuard {
  /** Row bound for a dictionary source. Mutable for tests. */
  @volatile var MaxRows: Int = 2000000

  /** Collect `prepared`'s rows, failing loud if the source holds more
    * than [[MaxRows]] rows. The limit is pushed into the plan, so an
    * over-limit fact table never streams fully to the driver. */
  def collectBounded(dictName: String,
      prepared: DataFrame): Array[org.apache.spark.sql.Row] = {
    val rows = prepared.limit(MaxRows + 1).collect()
    if (rows.length > MaxRows)
      throw new IllegalArgumentException(
        s"dictionary '$dictName' source exceeds $MaxRows rows — " +
          "broadcast dictionary layouts materialize fully in driver " +
          "memory; use a JOIN for fact-table lookups or raise " +
          "DictGuard.MaxRows if the table genuinely fits")
    rows
  }
}
