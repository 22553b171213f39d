package graft

import java.util.Properties

import org.apache.spark.sql.functions._

/** JDBC storage tier (the reference's actual sink: MySQL over pymysql,
  * load_sales_data.py:89,151) demonstrated against embedded Derby —
  * the same spark.read.jdbc / write.jdbc lines production would point
  * at MySQL. Covers: overwrite (truncate-and-load, S8), append,
  * predicate pushdown into the DB, and partitioned parallel reads.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
  System.setProperty("derby.stream.error.file",
    System.getProperty("java.io.tmpdir") + "/derby.log")

  private val url = "jdbc:derby:memory:graft_spec;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("write.jdbc overwrite + read.jdbc round trip preserves rows and types") {
    val d = Seq((1L, "apple", 1.5), (2L, "pear", 2.5), (3L, "plum", 0.0))
      .toDF("id", "name", "price")
    d.write.mode("overwrite")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(url, "fruits", props)
    val back = spark.read.jdbc(url, "fruits", props)
      .as[(Long, String, Double)].collect().toSet
    assert(back === Set((1L, "apple", 1.5), (2L, "pear", 2.5), (3L, "plum", 0.0)))
  }

  test("append accumulates; overwrite is the truncate-and-load refresh") {
    Seq((10L, "kiwi", 9.0)).toDF("id", "name", "price")
      .write.mode("append").jdbc(url, "fruits", props)
    assert(spark.read.jdbc(url, "fruits", props).count() === 4L)
    Seq((99L, "fig", 3.0)).toDF("id", "name", "price")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(url, "fruits", props)
    assert(spark.read.jdbc(url, "fruits", props).count() === 1L)
  }

  test("filter pushes into the database scan (PushedFilters on the JDBC relation)") {
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "name", "price")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(url, "pushdown_t", props)
    val q = spark.read.jdbc(url, "pushdown_t", props).filter(col("id") > 1L)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"filter not pushed into the JDBC scan:\n$plan")
    assert(q.count() === 2L)
  }

  test("partitioned parallel read: partition column splits the table scan") {
    (1L to 40L).map(i => (i, s"r$i", i * 1.0)).toDF("id", "name", "price")
      .write.mode("overwrite")
      .option("createTableColumnTypes", "name VARCHAR(64)")
      .jdbc(url, "parts_t", props)
    val df = spark.read.jdbc(url, "parts_t", "id", 1L, 41L, 4, props)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 40L)
  }

  test("JdbcUpsert.mergeInto: insert + update arms, idempotent re-send (S6/S9 over JDBC)") {
    import graft.sources.JdbcUpsert
    def state: Set[(Long, String, Double)] =
      spark.read.jdbc(url, "upsert_t", props)
        .as[(Long, String, Double)].collect().toSet

    // string keys need a VARCHAR width — Spark's Derby default (CLOB)
    // is not a legal merge key
    val vtype = Some("dy VARCHAR(32)")
    // first send creates the table and inserts every key
    val v1 = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0))
      .toDF("chain", "dy", "amt")
    JdbcUpsert.mergeInto(v1, url, "upsert_t", Seq("chain", "dy"), props, vtype)
    assert(state === Set((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0)))

    // mixed batch: key 2 updated, key 3 inserted, key 1 untouched
    val v2 = Seq((2L, "2024-01-01", 25.0), (3L, "2024-01-02", 30.0))
      .toDF("chain", "dy", "amt")
    JdbcUpsert.mergeInto(v2, url, "upsert_t", Seq("chain", "dy"), props, vtype)
    assert(state === Set((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 25.0),
      (3L, "2024-01-02", 30.0)))

    // re-sending the same batch is a no-op (the reference's
    // re-runnable nightly, load_sales_data.py:129-134)
    JdbcUpsert.mergeInto(v2, url, "upsert_t", Seq("chain", "dy"), props, vtype)
    assert(state === Set((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 25.0),
      (3L, "2024-01-02", 30.0)))
  }

  test("mergeInto fails LOUDLY on a NULL merge key: ill-defined, not lossy (r15 NULL-key probe)") {
    import graft.sources.JdbcUpsert
    // MERGE's ON clause never matches a NULL key, so every re-send
    // re-fires the INSERT arm: Derby aborts on its unique index,
    // MySQL silently duplicates — both break the idempotence contract.
    // The guard fires BEFORE the merge, names the count and the keys,
    // and leaves no partial target state.
    val bad = Seq((Some(1L), "2024-01-01", 10.0), (None, "2024-01-01", 20.0))
      .toDF("chain", "dy", "amt")
    val e = intercept[IllegalArgumentException] {
      JdbcUpsert.mergeInto(bad, url, "upsert_nullkey_t", Seq("chain", "dy"),
        props, Some("dy VARCHAR(32)"))
    }
    assert(e.getMessage.contains("NULL merge key") &&
      e.getMessage.contains("1 staged row"), e.getMessage)
    // nothing landed: the target was never created past the guard
    val created = scala.util.Try(
      spark.read.jdbc(url, "upsert_nullkey_t", props).count()).isSuccess
    assert(!created, "guard must fire before any target DDL/merge")
  }

  test("GraftDerbyDialect claims ONLY jdbc:derby URLs; other backends keep their own dialect") {
    import graft.sources.JdbcUpsert
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types.StringType
    JdbcUpsert.ensureDerbyDialect()
    // derby URLs resolve the wrapper: wide-VARCHAR string mapping
    val derby = JdbcDialects.get("jdbc:derby:memory:probe2")
    assert(derby.getJDBCType(StringType).map(_.databaseTypeDefinition)
      === Some("VARCHAR(32672)"),
      s"derby URL must resolve the graft wrapper, got ${derby.getClass.getName}")
    // r13 review: canHandle used to DELEGATE — if the registration
    // probe ever resolved the catch-all NoopDialect (canHandle always
    // true), the wrapper would claim every JDBC URL and force
    // VARCHAR(32672) strings on every backend. The prefix gate pins
    // the wrapper to derby; everything else resolves its own dialect.
    for (u <- Seq("jdbc:mysql://host/db", "jdbc:postgresql://host/db",
                  "jdbc:unknowndb://host/db")) {
      val d = JdbcDialects.get(u)
      assert(!d.getClass.getName.contains("GraftDerbyDialect"),
        s"$u captured by the Derby wrapper")
      assert(d.getJDBCType(StringType).map(_.databaseTypeDefinition)
        !== Some("VARCHAR(32672)"),
        s"$u got Derby's string mapping via ${d.getClass.getName}")
      // r14 review: mergeInto routes through the url-gated overload,
      // which must be a pure no-op off-Derby — the registration-time
      // probe require() must never be able to fail a MySQL upsert
      JdbcUpsert.ensureDerbyDialect(u)
    }
  }

  test("relaxNonKeyNullability: all-nullable batches keep their plan; widening is verbatim when needed") {
    import graft.sources.JdbcUpsert.relaxNonKeyNullability
    val keys = Seq("chain", "dy")
    // the common case — aggregate outputs arrive nullable already —
    // must return the SAME DataFrame: the old unconditional
    // createDataFrame(df.rdd, …) collapsed every upsert stage write to
    // an RDDScan, losing pruning/pushdown/codegen for nothing (r13
    // review). Reference identity ⇒ plan identity.
    val base = Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-02", 20.0))
      .toDF("chain", "dy", "amt")
    val agg = base.groupBy("chain", "dy").agg(sum("amt").as("amt"))
    assert(agg.schema("amt").nullable, "test setup: sum() arrives nullable")
    assert(relaxNonKeyNullability(agg, keys) eq agg,
      "nothing to widen ⇒ the original plan must survive untouched")
    // a literal-seeded backfill (amt non-nullable) still takes the
    // verbatim-schema round trip: non-keys widen, keys keep theirs
    val seeded = base.withColumn("amt", lit(0.0))
    assert(!seeded.schema("amt").nullable, "test setup: lit() is NOT NULL")
    val relaxed = relaxNonKeyNullability(seeded, keys)
    assert(relaxed.schema("amt").nullable, "non-key columns must widen")
    assert(relaxed.schema("chain").nullable === seeded.schema("chain").nullable
      && relaxed.schema("dy").nullable === seeded.schema("dy").nullable,
      "key columns keep their nullability (they are the match condition)")
    assert(relaxed.collect().toSet === seeded.collect().toSet)
  }

  test("golden file pins the COMPLETE statement sequence (DDL + index + merge) of both dialects") {
    import graft.sources.JdbcUpsert
    // mergeInto's probe-create-merge sequence, rendered per dialect on
    // the reference's sink fixture (load_sales_data.py:37-53). The
    // MySQL arm never executes in the sandbox (no server), so this
    // golden file IS its contract: any drift in any statement of
    // either dialect fails here, not in production.
    def render(name: String, d: JdbcUpsert.UpsertDialect): String = {
      val table = "tb_sales_by_day"; val stage = table + "_stage"
      val cols = Seq("chain", "dy", "amt", "cnt"); val keys = Seq("chain", "dy")
      Seq(
        s"== $name ==",
        s"catalog-name: ${d.catalogName(table)}",
        s"create-table: ${d.createTableDdl(table, stage)}",
        s"create-index: ${d.createKeyIndexDdl(table, keys)}",
        s"merge: ${d.mergeStatement(table, stage, cols, keys)}",
        s"merge-keys-only: ${d.mergeStatement("t", "t_stage", Seq("k"), Seq("k"))}",
        "").mkString("\n")
    }
    val actual = render("ansi", JdbcUpsert.AnsiMergeDialect) +
      render("mysql", JdbcUpsert.MySqlUpsertDialect)
    val in = getClass.getResourceAsStream("/jdbc_dialect_golden.txt")
    assert(in != null, s"golden file missing; expected content:\n$actual")
    val golden = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(actual === golden,
      s"dialect statement sequence drifted from golden file; actual:\n$actual")
  }

  test("MySQL dialect emits the reference's INSERT … ON DUPLICATE KEY UPDATE shape") {
    import graft.sources.JdbcUpsert
    // the statement the reference hand-builds per row
    // (load_sales_data.py:42-53), here set-based over the stage; no
    // MySQL server in the sandbox, so the generated SQL itself is the
    // pinned contract (the Derby-executed ANSI arm above proves the
    // shared staging/transaction machinery live)
    val sql = JdbcUpsert.MySqlUpsertDialect.mergeStatement(
      "tb_sales_by_day", "tb_sales_by_day_stage",
      Seq("chain", "dy", "amt", "cnt"), Seq("chain", "dy"))
    assert(sql ===
      "INSERT INTO `tb_sales_by_day` (`chain`, `dy`, `amt`, `cnt`) " +
        "SELECT `chain`, `dy`, `amt`, `cnt` FROM `tb_sales_by_day_stage` AS s " +
        "ON DUPLICATE KEY UPDATE `amt` = s.`amt`, `cnt` = s.`cnt`")
    // keys-only degenerate form still emits a legal statement
    val keysOnly = JdbcUpsert.MySqlUpsertDialect.mergeStatement(
      "t", "t_stage", Seq("k"), Seq("k"))
    assert(keysOnly.endsWith("ON DUPLICATE KEY UPDATE `k` = s.`k`"))
    // both dialects agree on the update/insert column partition
    val ansi = JdbcUpsert.AnsiMergeDialect.mergeStatement(
      "t", "t_stage", Seq("chain", "dy", "amt"), Seq("chain", "dy"))
    assert(ansi.contains("WHEN MATCHED THEN UPDATE SET \"amt\" = s.\"amt\"") &&
      !ansi.contains("UPDATE SET \"chain\""))
  }
}
