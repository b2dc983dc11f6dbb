package graft

/** The fixture dir the NEXT `SparkEntry.oracleSql` evaluation refers
  * to. A handful of oracle SQL strings read durable parquet artifacts
  * (`TempDirs.durable`) that the paired query materializes — k-means
  * centroids, hashed-shingle sets — and those paths are scoped per
  * input dir, so the SQL text itself is dir-dependent. `Verify` sets
  * this to its sfDir argument before dumping `oracle_sql.json`; local
  * tools that evaluate oracle SQL for another dir set it likewise.
  * Defaults to the driver's correctness-gate fixture.
  */
object OracleDir {
  @volatile var current: String = "/root/testdata/sf0.01"
}
