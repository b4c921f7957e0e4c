package graft

import graft.crawl.{CrawlConfig, CrawlDriver, SyntheticWeb}
import graft.functions.CanonicalUrl
import graft.operators.{Components, Multimodal, Similarity, TextOps}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract (see SURVEY.md §2/§5.3): one query per exposed operator,
  * each with a DuckDB-runnable oracle SQL twin over the same parquet
  * tables. Column names/types are aliased identically on both sides; double
  * aggregates are rounded on both sides (summation association).
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: end-to-end distributed crawl (frontier, budget, robots,
    * bloom-dedup, snapshot checkpoints) on the deterministic synthetic web;
    * returns the crawl-ordering trace. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val web = SyntheticWeb.WebConfig(hosts = 8, pagesPerHost = 30)
    val cfg = CrawlConfig(SyntheticWeb.seedUrls(16, web), budgetPerHost = 4,
      maxWaves = 5, web = web, robots = SyntheticWeb.robotsFixture(web))
    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    CrawlDriver.run(spark, cfg, root)
    new graft.sources.SnapshotStore(root, spark).read("trace")
  }

  // ---- shared text fragments (Spark side) --------------------------------
  private def toks(c: Column) = TextOps.tokens(c)
  private def sh3(ts: Column, text: Column) = TextOps.shingles(ts, text, 3)

  private def canonCol(c: org.apache.spark.sql.Column) =
    graft.functions.CanonicalizeUrl.canonicalize_url(c) // native Catalyst Expression

  private def docsWithShingles(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .withColumn("ts", toks(col("text")))
      .withColumn("sh", sh3(col("ts"), col("text")))

  /** All 8 minhash slots from the ONE native codegen'd expression (plan is
    * a single node instead of 8 CodegenFallback lambda trees); semantics
    * identical to the composed TextOps pipeline (asserted in QueriesSpec).
    */
  private def minhashSigs(s: SparkSession, dir: String): DataFrame = {
    val sig = graft.functions.MinhashSignatures.minhash_signatures(col("text"), 8, 3)
    T(s, dir, "documents")
      .select(col("doc_id"), sig.as("mhs"))
      .select((col("doc_id") +:
        (0 until 8).map(i => element_at(col("mhs"), i + 1).as(s"mh$i"))): _*)
  }

  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = graft.functions.MinhashSignatures.minhash_signatures(col("text"), 8, 3)
    // (band, mh) keys straight off the signature array; materialize once —
    // the self-join would otherwise recompute minhash for each side
    val bands = T(s, dir, "documents")
      .select(col("doc_id"), posexplode(sig).as(Seq("band", "mh")))
      .localCheckpoint(false)
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("mh"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("mh"))
    a.join(b, Seq("band", "mh")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  // DuckDB twins of the shared fragments
  private val SqlToks =
    "list_filter(string_split(text, ' '), t -> t != '')"
  private val SqlSh3 =
    s"CASE WHEN len(ts) >= 3 THEN list_transform(range(1, len(ts)-1), " +
      "j -> ts[j] || ' ' || ts[j+1] || ' ' || ts[j+2]) ELSE [text] END"
  private val SqlDocsWithShingles =
    s"WITH t0 AS (SELECT *, $SqlToks AS ts FROM documents), " +
      s"d AS (SELECT *, $SqlSh3 AS sh FROM t0)"
  private def sqlMinhashSigs: String =
    s"$SqlDocsWithShingles, sigs AS (SELECT doc_id, " +
      (0 until 8).map(i =>
        s"list_min(list_transform(sh, s -> md5('$i|' || s))) AS mh$i").mkString(", ") +
      " FROM d)"
  private def sqlLshPairs: String =
    s"$sqlMinhashSigs, bands AS (" +
      (0 until 8).map(i => s"SELECT doc_id, $i AS band, mh$i AS mh FROM sigs")
        .mkString(" UNION ALL ") + "), " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)"

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data-pipeline ops (dedup / similarity / text / multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation (A1/A2)
    "q_hash_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
    }),
    "q_rollup" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 4).as("sum_qty"))
    }),
    // ---- per-group top-K == the politeness-budget operator shape (Q1/Q2)
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("event_type"), col("rn"))
    }),
    // ---- anti/semi join == seen-set dedup shape (D4)
    "q_anti_join" -> ((s, dir) => {
      val bld = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      T(s, dir, "orders")
        .join(bld, col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"))
    }),
    "q_semi_join" -> ((s, dir) => {
      val bld = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      T(s, dir, "orders")
        .join(bld, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
    }),
    // ---- first-occurrence dedup (D2). r6 shape: min(struct(ts, event_id,
    // value)) replaces the sort window — a partial-aggregatable hash agg
    // (map-side reduction, no per-group sort, hot groups stream in O(1)
    // memory). struct ordering is lexicographic on (ts, event_id), the
    // window's exact sort key; (ts, event_id) is unique within a group
    // (checked across all SFs), so the selected row is identical.
    "q_first_dedup" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("event_type"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))
    }),
    // ---- sort / limit (O1/O2)
    "q_sort_limit" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),
    // ---- set ops (O3/O4)
    "q_union" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
        .unionByName(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")))
    }),
    "q_except" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.filter(col("o_totalprice") > 300000).select(col("o_orderkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey")))
    }),
    // ---- analytic window (running politeness-budget accounting shape).
    // l_quantity is the FINAL tiebreak: the synthetic lineitem is not
    // uniquely keyed at every sf ((orderkey, linenumber) dupes exist), and
    // a sort-key tie between different quantities makes the running sum
    // order-ambiguous across engines; ties on quantity are harmless since
    // only quantity is summed.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_quantity")).over(w), 4).as("running_qty"))
    }),
    // ---- multi-join + agg (broadcast dims)
    "q_join_agg" -> ((s, dir) => {
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 4).as("total"))
    }),
    // ---- explode / spans (T2)
    "q_token_explode" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
    }),
    // ---- text analysis: token counting
    "q_token_count" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"))
    }),
    // ---- text analysis: quality scoring
    "q_quality" -> ((s, dir) => {
      T(s, dir, "documents")
        .withColumn("ts", toks(col("text")))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(col("ts")).cast("long").as("n_tokens"),
          size(array_distinct(col("ts"))).cast("long").as("uniq_tokens"),
          round(size(array_distinct(col("ts"))).cast("double") / size(col("ts")), 6)
            .as("uniq_ratio"),
          round(aggregate(transform(col("ts"), t => length(t)), lit(0),
            (acc, x) => acc + x).cast("double") / size(col("ts")), 6)
            .as("avg_token_len"))
    }),
    // ---- text analysis: quality ratios (punctuation + stopword density —
    // the classic low-quality-document signals)
    "q_quality_ratios" -> ((s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "alpha", "echo")
      T(s, dir, "documents")
        .withColumn("ts", toks(col("text")))
        .select(col("doc_id"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")))
            .cast("long").as("n_punct"),
          round((length(col("text")) -
            length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")))
            .cast("double") / greatest(length(col("text")), lit(1)), 6)
            .as("punct_ratio"),
          size(filter(col("ts"), t => t.isin(stop: _*))).cast("long").as("n_stop"),
          round(size(filter(col("ts"), t => t.isin(stop: _*))).cast("double")
            / greatest(size(col("ts")), lit(1)), 6).as("stopword_ratio"))
    }),
    // ---- text analysis: character-n-gram language/category ID (the
    // n-gram-profile heuristic: score = |doc trigram set ∩ profile set|)
    "q_lang_ngram" -> ((s, dir) => {
      def profile(words: Seq[String]): Seq[String] = words.flatMap { w =>
        (0 to w.length - 3).map(i => w.substring(i, i + 3))
      }.distinct.sorted
      val p1 = profile(Seq("join", "scan", "merge"))
      val p2 = profile(Seq("filter", "sort", "window"))
      val p3 = profile(Seq("stream", "batch", "query"))
      val lowered = lower(col("text"))
      val grams = when(length(lowered) >= 3,
        array_distinct(transform(sequence(lit(1), length(lowered) - 2),
          j => lowered.substr(j, lit(3))))).otherwise(array().cast("array<string>"))
      def score(p: Seq[String]) =
        size(array_intersect(grams, array(p.map(lit): _*))).cast("int")
      T(s, dir, "documents")
        .withColumn("score_g1", score(p1))
        .withColumn("score_g2", score(p2))
        .withColumn("score_g3", score(p3))
        .withColumn("pred", TextOps.argmaxLabel(Seq(
          "g1" -> col("score_g1"), "g2" -> col("score_g2"), "g3" -> col("score_g3"))))
        .select(col("doc_id"), col("score_g1"), col("score_g2"), col("score_g3"), col("pred"))
    }),
    // ---- text analysis: marker-based language/category ID
    "q_lang_id" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val g1 = TextOps.markerScore(col("text"), Seq("join", "scan", "merge")).cast("int")
      val g2 = TextOps.markerScore(col("text"), Seq("filter", "sort", "window")).cast("int")
      val g3 = TextOps.markerScore(col("text"), Seq("stream", "batch", "query")).cast("int")
      d.withColumn("score_g1", g1).withColumn("score_g2", g2).withColumn("score_g3", g3)
        .withColumn("pred", TextOps.argmaxLabel(Seq(
          "g1" -> col("score_g1"), "g2" -> col("score_g2"), "g3" -> col("score_g3"))))
        .select(col("doc_id"), col("score_g1"), col("score_g2"), col("score_g3"), col("pred"))
    }),
    // ---- fingerprinting
    "q_fingerprint" -> ((s, dir) => {
      docsWithShingles(s, dir).select(col("doc_id"),
        md5(col("text")).as("fp_md5"),
        array_min(transform(col("sh"), x => md5(x))).as("fp_minshingle"))
    }),
    // ---- exact dedup
    "q_dedup_exact" -> ((s, dir) => {
      T(s, dir, "documents")
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
    }),
    // ---- MinHash signatures
    "q_minhash_sig" -> ((s, dir) => minhashSigs(s, dir)),
    // ---- MinHash-LSH candidate pairs
    "q_lsh_pairs" -> ((s, dir) => lshPairs(s, dir)),
    // ---- n-gram Jaccard over LSH candidates. Set-array intersection per
    // candidate pair: ~|cands| fat rows move instead of the
    // |cands| × |shingles-per-doc| skinny-row blowup of an
    // exploded-shingle equijoin (the old shape shuffled ~100× more rows)
    "q_jaccard" -> ((s, dir) => {
      val docSets = docsWithShingles(s, dir)
        .select(col("doc_id"), array_distinct(col("sh")).as("ss"))
        .localCheckpoint(false) // reused by both pair sides
      val cands = lshPairs(s, dir)
      cands
        .join(docSets.select(col("doc_id").as("doc_a"), col("ss").as("sa")), "doc_a")
        .join(docSets.select(col("doc_id").as("doc_b"), col("ss").as("sb")), "doc_b")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
        .select(col("doc_a"), col("doc_b"),
          round(col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")), 6)
            .as("jaccard"))
    }),
    // ---- SimHash signatures. r6 shape: PER-ROW — md5 once per token into
    // an array, then 16 integer folds over it. The old explode +
    // groupBy(doc_id) shuffled every token and hashed each one 16x (one
    // md5 per bit-sum aggregate); integer +/-1 sums are order-independent,
    // so the per-row fold is value-identical, and a doc with zero tokens
    // is filtered out exactly as explode dropped it.
    "q_simhash" -> ((s, dir) => {
      val d = T(s, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("ts"))
        .filter(size(col("ts")) > 0)
        .select(col("doc_id"), transform(col("ts"), t => md5(t)).as("mds"))
      val sums = (0 until 16).map { j =>
        aggregate(col("mds"), lit(0),
          (acc, m) => acc + when(substring(m, j + 1, 1) >= "8", 1).otherwise(-1))
          .as(s"s$j")
      }
      d.select((col("doc_id") +: sums): _*)
        .select(col("doc_id"),
          TextOps.simhashFromSums((0 until 16).map(j => col(s"s$j"))).as("simhash"))
    }),
    // ---- ANN: exact cosine top-k baseline
    "q_ann_topk" -> ((s, dir) =>
      Similarity.cosineTopK(T(s, dir, "embeddings"), col("vec_id") < 8, k = 5)),
    // ---- ANN: LSH-bucketed scale path (approximate recall by design, but
    // deterministic: md5-derived planes, so the oracle re-derives buckets)
    "q_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(T(s, dir, "embeddings"), col("vec_id") < 8, k = 5)),
    // ---- ANN: IVF coarse-quantizer scale path. The driver-checked form
    // uses the md5-seeded quantizer (oracle re-derives the identical lists);
    // the Lloyd-trained reusable index is IvfIndex (recall-tested in sbt).
    "q_ann_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.ivfTopK(emb, col("vec_id") < 8, k = 5,
        centroids = Similarity.seedCentroids(emb, nlist = 16), nprobe = 4)
    }),
    // ---- ANN: the LLOYD-TRAINED IVF index on the driver gate. One Lloyd
    // refinement pass (assign to md5 seeds -> per-cluster centroid means)
    // IS SQL-expressible, so the oracle re-derives the TRAINED quantizer
    // itself — lists, probes and top-k included. Cross-engine float parity:
    // each engine averages in its own summation order, so the trained
    // centroids are rounded to 6dp on BOTH sides (Spark Round semantics ==
    // DuckDB round, proven across the r1/r2 gate) before any distance is
    // computed — from identical rounded centroids both engines fold
    // distances in ascending-dim order and every comparison lands
    // identically. Multi-iteration training stays sbt-tested (QueriesSpec).
    "q_ann_ivf_trained" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val trained = graft.operators.IvfIndex.train(emb, nlist = 16, lloydIters = 1)
        .map(_.map(x =>
          BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      Similarity.ivfTopK(emb, col("vec_id") < 8, k = 5,
        centroids = trained, nprobe = 4)
    }),
    // ---- embedding near-dup pairs (label-blocked exactness baseline)
    "q_embedding_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(T(s, dir, "embeddings"), threshold = 0.30)),
    // ---- embedding near-dup pairs, LSH-bucket-routed (the 100-TB path:
    // shuffle key = bucket, no block ever goes quadratic in the corpus)
    "q_embedding_neardup_lsh" -> ((s, dir) =>
      Similarity.nearDupPairsLsh(T(s, dir, "embeddings"), threshold = 0.30)),
    // ---- SemDeDup semantic dedup: coarse-quantizer clusters bound the
    // quadratic (the cluster id is the shuffle key); within a cluster the
    // earliest member within the cosine threshold owns its duplicates. The
    // md5-seeded quantizer makes the whole operator SQL-rederivable; the
    // Lloyd-trained IvfIndex quantizer is the production form (sbt-tested).
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.semanticDedup(emb,
        Similarity.seedCentroids(emb, nlist = 16), threshold = 0.30)
    }),
    // ---- fuzzy-dedup grouping: transitive closure of the LSH near-dup
    // candidate pairs (a~b, b~c => one group). Min-label propagation on the
    // engine side; the oracle recomputes min-reachable-id with a recursive
    // CTE — both deterministic, so the component labeling hash-checks.
    "q_dup_components" -> ((s, dir) => {
      val pairs = Similarity.nearDupPairsLsh(T(s, dir, "embeddings"), threshold = 0.30)
      // edgesDistinct: nearDupPairsLsh emits distinct (id_a < id_b) pairs
      // by construction (distinct candidate pairs equijoined to unique-id
      // embeddings, then filtered), so the operator's setup dedup — a full
      // edge-list shuffle — is provably wasted here and skipped (r6)
      Components.connectedComponents(pairs, edgesDistinct = true)
        .select(col("id").as("vec_id"), col("comp"))
    }),
    // ---- multimodal metadata over binary payloads
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.docsAsMedia(s, T(s, dir, "documents"))
      media.select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        (lit(64) + pmod(octet_length(col("payload")).cast("long"), lit(448L))).as("width"),
        (lit(64) + pmod(octet_length(col("payload")).cast("long") * 7, lit(448L))).as("height"),
        (lit(1) + pmod(octet_length(col("payload")).cast("long"), lit(15L))).as("n_frames"))
    }),
    // ---- multimodal frame sampling: every 4th frame of each payload
    // (explode-with-step fan-out; metadata-derived frame count as in
    // q_multimodal_meta — the xxhash decode stub is spec-tested instead)
    "q_multimodal_frames" -> ((s, dir) => {
      val media = Multimodal.docsAsMedia(s, T(s, dir, "documents"))
      media
        .withColumn("n_frames",
          (lit(1) + pmod(octet_length(col("payload")).cast("long"), lit(15L))).cast("int"))
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("fi"))
        .select(col("doc_id"), col("fi").cast("long").as("frame_idx"))
    }),
    // ---- BPE-ish regex token counting (byte-pair-style piece pattern)
    "q_token_bpe" -> ((s, dir) => {
      val pieces = regexp_extract_all(lower(col("text")),
        lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"), lit(0))
      T(s, dir, "documents").select(col("doc_id"),
        size(pieces).cast("long").as("n_pieces"),
        size(array_distinct(pieces)).cast("long").as("n_distinct_pieces"))
    }),
    // ---- winnowing fingerprints over a Karp-Rabin rolling hash (native
    // Catalyst expression; near-dup primitive)
    "q_winnow_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        explode(graft.functions.RollingFingerprint.rolling_fingerprint(col("text")))
          .as("fp"))
    }),
    // ---- distinct counts (A4): exact distinct for the oracle; the engine
    // uses approx_count_distinct for its own metrics
    "q_distinct_count" -> ((s, dir) => {
      T(s, dir, "lineitem").agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
    }),
    // ---- URL canonicalization (P1) — oracle constructs the expected form
    "q_url_canonicalize" -> ((s, dir) => {
      T(s, dir, "documents").select(col("doc_id"),
        canonCol(concat(lit("HTTP://HOST"), pmod(col("doc_id"), lit(20)).cast("string"),
          lit(".TEST:80/a/../p/"), col("doc_id").cast("string"), lit("#frag")))
          .as("canonical_url"))
    }),
    // ---- corpus-assembly ops (training-data pipeline): deterministic
    // hash split, per-source quota downsampling, token-budget packing.
    // All keyed on md5 strings compared lexicographically — the repo's
    // standard cross-engine derivation (DuckDB lacks xxhash64).
    // Train/valid/test split as a pure function of the doc id (survives
    // re-runs, re-partitioning and incremental appends — no RNG state):
    // first hex char of md5 partitions 12/2/2 of 16 ≈ 75/12.5/12.5.
    "q_sample_split" -> ((s, dir) => {
      val h = substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 1)
      T(s, dir, "documents").select(col("doc_id"),
        when(h < "c", "train").when(h < "e", "valid").otherwise("test").as("split"))
    }),
    // Per-source quota (the corpus-mixing cap): keep at most 10 docs per
    // source, chosen by deterministic hash order so the sample is stable
    // and unbiased by ingest order. Window per source — scale-safe.
    "q_domain_cap" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("cap|"), col("doc_id").cast("string"))), col("doc_id"))
      T(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("doc_id"))
    }),
    // Token-budget packing (sequence-packing shard assignment): docs in
    // stable (source, doc_id) order are chunked by cumulative token count
    // at a 256-token budget. r6 two-phase running sum (VERDICT item 8,
    // guide §8 step 3): a single per-source window serializes a
    // mega-source into one sorted task; instead the doc_id space is cut
    // into ORDER-PRESERVING ranges (bucket = doc_id >> 20, so a window
    // task never sorts more than 2^20 rows), local running sums run per
    // (source, bucket), and each bucket's offset = sum of all earlier
    // buckets' totals per source (a window over per-bucket TOTALS — one
    // row per non-empty bucket, ~2^20x smaller than the data). Long sums
    // are exact and associative, so cum = offset + local cum is
    // bit-identical to the single window; at sf0.1 every doc falls in
    // bucket 0 and the plan degenerates to the original shape plus one
    // tiny agg+join.
    "q_pack_chunks" -> ((s, dir) => {
      val bkt = shiftright(col("doc_id").cast("long"), 20)
      val wLocal = Window.partitionBy(col("source"), col("bkt"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // consumed by the totals agg AND the final join; both sides hang off
      // the same (source, bkt) exchange, which Spark reuses — no
      // materialization needed
      val local = T(s, dir, "documents")
        .withColumn("tok", size(toks(col("text"))).cast("long"))
        .withColumn("bkt", bkt)
        .withColumn("cum_local", sum(col("tok")).over(wLocal))
      val wOff = Window.partitionBy(col("source")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // tok >= 0 makes cum_local monotone within the bucket: max = total
      val offsets = local.groupBy(col("source"), col("bkt"))
        .agg(max(col("cum_local")).as("btot"))
        .withColumn("offset", coalesce(sum(col("btot")).over(wOff), lit(0L)))
        .select(col("source"), col("bkt"), col("offset"))
      local.join(offsets, Seq("source", "bkt"))
        .select(col("doc_id"), col("source"), col("tok"),
          floor((col("offset") + col("cum_local") - col("tok")) / lit(256))
            .cast("long").as("chunk"))
    }),
    // Benchmark decontamination: a train doc sharing ANY word-3-gram with
    // any test-split doc is contaminated. Distinct shingles per side, one
    // equijoin on the shingle key (never all-pairs) — scale-safe: the join
    // fans out only on actually-shared shingles.
    "q_decontaminate" -> ((s, dir) => {
      val h = substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 1)
      val d = docsWithShingles(s, dir)
        .withColumn("split",
          when(h < "c", "train").when(h < "e", "valid").otherwise("test"))
        .localCheckpoint(false) // read by both split sides below
      val testG = d.filter(col("split") === "test")
        .select(explode(array_distinct(col("sh"))).as("g")).distinct()
      val trainG = d.filter(col("split") === "train")
        .select(col("doc_id"), explode(array_distinct(col("sh"))).as("g"))
      val hits = trainG.join(testG, "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      d.filter(col("split") === "train").select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) === 0L).as("clean"))
    }),
    // Gopher-style within-doc repetition signals: duplicate word-2-gram
    // fraction + most-frequent-token mass. Pure per-doc exprs + one
    // (doc, token) hash agg — scale-safe.
    "q_repetition" -> ((s, dir) => {
      val t = T(s, dir, "documents").withColumn("ts", toks(col("text")))
      val base = t
        .withColumn("g2", when(size(col("ts")) >= 2,
          expr("transform(sequence(1, size(ts)-1), " +
            "j -> concat(element_at(ts, j), ' ', element_at(ts, j+1)))"))
          .otherwise(typedLit(Seq.empty[String])))
        .select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"),
          when(size(col("ts")) >= 2,
            round(lit(1.0) - size(array_distinct(col("g2"))).cast("double")
              / size(col("g2")).cast("double"), 6))
            .otherwise(lit(0.0)).as("dup_2gram_frac"))
      val top = t.select(col("doc_id"), explode(col("ts")).as("tk"))
        .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("maxc"), sum(col("c")).as("tot"))
        .select(col("doc_id"),
          round(col("maxc").cast("double") / col("tot").cast("double"), 6)
            .as("top_token_frac"))
      base.join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("dup_2gram_frac"),
          coalesce(col("top_token_frac"), lit(0.0)).as("top_token_frac"))
    }),
    // Corpus TF-IDF: top-3 tokens per doc by tf * ln(N/df), token-asc
    // tiebreak. Two hash aggs + one equijoin on the token key + a per-doc
    // window — scale-safe; the 1-row corpus count is broadcast.
    "q_tfidf_top" -> ((s, dir) => {
      val tk = T(s, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("tk"))
      // tf rows are already distinct on (doc_id, tk), so df = tf's row
      // count per token — the old tk.distinct() re-exploded every token
      // and paid a second full shuffle of the raw token stream (r6:
      // one explode pass, tf materialized once for both consumers)
      val tf = tk.groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val dfreq = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
      val n = T(s, dir, "documents").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tk"))
      tf.join(dfreq, "tk").crossJoin(broadcast(n))
        .withColumn("tfidf",
          col("tf").cast("double") * log(col("n").cast("double") / col("df").cast("double")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("tk").as("token"),
          round(col("tfidf"), 6).as("tfidf"), col("rk"))
    }),
    // PII detection + redaction (the C4/RefinedWeb scrub): email + IPv4
    // patterns counted and replaced. The synthetic corpus carries no PII, so
    // a pii-bearing text is derived DETERMINISTICALLY from the row on both
    // sides (same concat) — the operator under test is the regex scrub.
    // Pure per-row exprs — scale-safe.
    "q_pii_redact" -> ((s, dir) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"
      T(s, dir, "documents")
        .withColumn("ptext", concat(
          lit("user"), col("doc_id").cast("string"), lit("@"), col("source"),
          lit(".com 10.0."), (col("doc_id") % 200).cast("string"), lit("."),
          (col("doc_id") % 250).cast("string"), lit(" "), col("text")))
        .select(col("doc_id"),
          size(regexp_extract_all(col("ptext"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("ptext"), lit(ipRe), lit(0)))
            .cast("long").as("n_ips"),
          md5(regexp_replace(regexp_replace(col("ptext"), emailRe, "[EMAIL]"),
            ipRe, "[IP]")).as("redacted_md5"))
    }),
    // Cross-doc passage-level exact dedup (the C4 duplicate-line rule over a
    // newline-free corpus): non-overlapping 5-token windows; first occurrence
    // corpus-wide (by doc_id, then position) owns the passage, later ones
    // are duplicates. One shuffle on the passage key — scale-safe.
    // r6 de-skew (VERDICT item 3): the old passage-key WINDOW sorted every
    // occurrence of a passage in ONE partition — a boilerplate passage at
    // 10^8 copies lands on one task. Now: rk>1 occurrences per doc =
    // (rows of the doc) − (passages whose corpus-wide FIRST occurrence,
    // i.e. min (doc_id, pos), lies in the doc). Both sides are
    // partial-aggregatable hash aggs; no window, no sort, no join on the
    // passage key. min(struct) is the same total order the window used.
    "q_passage_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
        .withColumn("ts", toks(col("text")))
        .withColumn("parr",
          expr("transform(sequence(0, cast(ceil(size(ts) / 5.0) AS INT) - 1), " +
            "i -> concat_ws(' ', slice(ts, i*5+1, 5)))"))
      val p = docs.select(col("doc_id"),
        posexplode(col("parr")).as(Seq("pos", "passage")))
      val owned = p.groupBy(col("passage"))
        .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
        .groupBy(col("first.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_owned"))
      // per-doc passage count straight off the same array — no second
      // explode pass and no materialization (size(parr) == rows explode
      // emits; a null text yields a null array on both branches)
      docs.select(col("doc_id"), size(col("parr")).cast("long").as("n_passages"))
        .where(col("n_passages").isNotNull)
        .join(owned, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_passages"),
          (col("n_passages") - coalesce(col("n_owned"), lit(0L))).as("n_dupes"))
    })
  )

  // Shared embedding CTE fragments (DuckDB): double-promoted embeddings,
  // norms, and the md5-derived sign-bit LSH planes/buckets — the EXACT
  // derivation the Spark side uses, so the approximate ANN paths are
  // deterministic and hash-checkable, not rows-only.
  private val SqlEmbN =
    """e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      |       FROM embeddings),
      |n AS (SELECT vec_id, emb,
      |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e)""".stripMargin
  private val SqlLshBuckets =
    """planes AS (
      |  SELECT t, h, list(CASE WHEN substr(md5('hp|' || t || '|' || h || '|' || j), 1, 1) < '8'
      |                    THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY j) AS wv
      |  FROM range(4) tt(t) CROSS JOIN range(8) hh(h) CROSS JOIN range(64) jj(j)
      |  GROUP BY t, h),
      |bits AS (
      |  SELECT n.vec_id, p.t, p.h,
      |    CASE WHEN list_sum(list_transform(range(1, 65), j -> n.emb[j] * p.wv[j])) >= 0
      |         THEN '1' ELSE '0' END AS bit
      |  FROM n CROSS JOIN planes p),
      |buckets AS (
      |  SELECT vec_id, t::VARCHAR || '|' || string_agg(bit, '' ORDER BY h) AS bucket
      |  FROM bits GROUP BY vec_id, t),
      |ex AS (SELECT n.vec_id, n.emb, n.nrm, b.bucket FROM n JOIN buckets b USING (vec_id))""".stripMargin

  /** DuckDB-runnable twins — one per query, including the approximate ANN
    * paths (deterministic md5-derived buckets/lists re-derived in SQL).
    */
  def oracleSql: Map[String, String] = Map(
    "q_hash_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_topk_per_group" ->
      """SELECT user_id, event_id, event_type, rn FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,
    "q_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')""".stripMargin,
    "q_first_dedup" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_union" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
        |UNION ALL
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_except" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
        |FROM lineitem""".stripMargin,
    "q_join_agg" ->
      """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_token_explode" ->
      s"SELECT doc_id, unnest($SqlToks) AS token FROM documents",
    "q_token_count" ->
      s"SELECT doc_id, len($SqlToks) AS n_tokens, length(text)::BIGINT AS n_chars FROM documents",
    "q_quality" ->
      s"""WITH t0 AS (SELECT doc_id, text, $SqlToks AS ts FROM documents)
         |SELECT doc_id, length(text)::BIGINT AS n_chars, len(ts)::BIGINT AS n_tokens,
         |  len(list_distinct(ts))::BIGINT AS uniq_tokens,
         |  round(len(list_distinct(ts))::DOUBLE / len(ts), 6) AS uniq_ratio,
         |  round(list_sum(list_transform(ts, t -> length(t)))::DOUBLE / len(ts), 6)
         |    AS avg_token_len
         |FROM t0""".stripMargin,
    "q_quality_ratios" -> {
      val stop = Seq("the", "a", "of", "and", "to", "in", "alpha", "echo")
        .map(w => s"'$w'").mkString(", ")
      s"""WITH t0 AS (SELECT doc_id, text, $SqlToks AS ts FROM documents)
         |SELECT doc_id,
         |  (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::BIGINT
         |    AS n_punct,
         |  round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))::DOUBLE
         |    / greatest(length(text), 1), 6) AS punct_ratio,
         |  len(list_filter(ts, t -> t IN ($stop)))::BIGINT AS n_stop,
         |  round(len(list_filter(ts, t -> t IN ($stop)))::DOUBLE
         |    / greatest(len(ts), 1), 6) AS stopword_ratio
         |FROM t0""".stripMargin
    },
    "q_multimodal_frames" ->
      """SELECT doc_id, unnest(range(0, 1 + strlen(text)::BIGINT % 15, 4)) AS frame_idx
        |FROM documents""".stripMargin,
    "q_lang_ngram" -> {
      def profile(words: Seq[String]): Seq[String] = words.flatMap { w =>
        (0 to w.length - 3).map(i => w.substring(i, i + 3))
      }.distinct.sorted
      def lst(p: Seq[String]) = p.map(g => s"'$g'").mkString("[", ", ", "]")
      val (p1, p2, p3) = (profile(Seq("join", "scan", "merge")),
        profile(Seq("filter", "sort", "window")),
        profile(Seq("stream", "batch", "query")))
      s"""WITH g AS (SELECT doc_id,
         |  CASE WHEN length(text) >= 3 THEN list_distinct(list_transform(
         |    range(1, length(text) - 1), j -> substr(lower(text), j, 3)))
         |  ELSE []::VARCHAR[] END AS grams FROM documents),
         |sc AS (SELECT doc_id,
         |  len(list_intersect(grams, ${lst(p1)}))::INTEGER AS score_g1,
         |  len(list_intersect(grams, ${lst(p2)}))::INTEGER AS score_g2,
         |  len(list_intersect(grams, ${lst(p3)}))::INTEGER AS score_g3 FROM g)
         |SELECT doc_id, score_g1, score_g2, score_g3,
         |  CASE WHEN score_g1 >= greatest(score_g2, score_g3) THEN 'g1'
         |       WHEN score_g2 >= score_g3 THEN 'g2'
         |       ELSE 'g3' END AS pred
         |FROM sc""".stripMargin
    },
    "q_lang_id" -> {
      def score(ws: Seq[String]) = ws.map(w =>
        s"(CASE WHEN position(' $w ' IN ' ' || lower(text) || ' ') > 0 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""SELECT doc_id,
         |  (${score(Seq("join", "scan", "merge"))})::INTEGER AS score_g1,
         |  (${score(Seq("filter", "sort", "window"))})::INTEGER AS score_g2,
         |  (${score(Seq("stream", "batch", "query"))})::INTEGER AS score_g3,
         |  CASE
         |    WHEN (${score(Seq("join", "scan", "merge"))}) >=
         |         greatest((${score(Seq("filter", "sort", "window"))}),
         |                  (${score(Seq("stream", "batch", "query"))})) THEN 'g1'
         |    WHEN (${score(Seq("filter", "sort", "window"))}) >=
         |         (${score(Seq("stream", "batch", "query"))}) THEN 'g2'
         |    ELSE 'g3' END AS pred
         |FROM documents""".stripMargin
    },
    "q_fingerprint" ->
      s"""$SqlDocsWithShingles
         |SELECT doc_id, md5(text) AS fp_md5,
         |  list_min(list_transform(sh, x -> md5(x))) AS fp_minshingle
         |FROM d""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_minhash_sig" ->
      s"$sqlMinhashSigs SELECT * FROM sigs",
    "q_lsh_pairs" ->
      s"$sqlLshPairs SELECT doc_a, doc_b FROM cand",
    "q_jaccard" ->
      s"""$sqlLshPairs,
         |ds AS (SELECT doc_id, list_distinct(sh) AS ss FROM d)
         |SELECT c.doc_a, c.doc_b,
         |  round(len(list_intersect(a.ss, b.ss))::DOUBLE
         |    / (len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss))), 6) AS jaccard
         |FROM cand c
         |JOIN ds a ON a.doc_id = c.doc_a
         |JOIN ds b ON b.doc_id = c.doc_b""".stripMargin,
    "q_simhash" -> {
      val bits = (1 to 16).map(j =>
        s"CASE WHEN sum(CASE WHEN substr(md5(t), $j, 1) >= '8' THEN 1 ELSE -1 END) > 0" +
          " THEN '1' ELSE '0' END").mkString(", ")
      s"""WITH toks AS (SELECT doc_id, unnest($SqlToks) AS t FROM documents)
         |SELECT doc_id, concat($bits) AS simhash FROM toks GROUP BY doc_id""".stripMargin
    },
    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
        |           FROM embeddings),
        |n AS (SELECT vec_id, emb,
        |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn FROM n WHERE vec_id < 8),
        |p AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |        list_sum(list_transform(range(1, 65), j -> qe[j] * emb[j])) / (qn * nrm) AS c
        |      FROM q, n WHERE n.vec_id != q.query_id)
        |SELECT query_id, neighbor_id, round(c, 6) AS cos, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY c DESC, neighbor_id) AS rank FROM p)
        |WHERE rank <= 5""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH $SqlEmbN,
         |$SqlLshBuckets,
         |q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn, bucket
         |      FROM ex WHERE vec_id < 8),
         |p AS (SELECT q.query_id, x.vec_id AS neighbor_id,
         |        list_sum(list_transform(range(1, 65), j -> q.qe[j] * x.emb[j]))
         |          / (q.qn * x.nrm) AS c
         |      FROM q JOIN ex x USING (bucket) WHERE x.vec_id != q.query_id),
         |g AS (SELECT query_id, neighbor_id, max(c) AS c FROM p
         |      GROUP BY query_id, neighbor_id)
         |SELECT query_id, neighbor_id, round(c, 6) AS cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY c DESC, neighbor_id) AS rank FROM g)
         |WHERE rank <= 5""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH $SqlEmbN,
         |ranked AS (SELECT vec_id, emb,
         |    row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS r FROM e),
         |seeds AS (SELECT r - 1 AS cid, emb AS cemb FROM ranked WHERE r <= 16),
         |dist AS (SELECT e.vec_id, s.cid,
         |    list_sum(list_transform(range(1, 65),
         |      j -> (e.emb[j] - s.cemb[j]) * (e.emb[j] - s.cemb[j]))) AS d
         |  FROM e CROSS JOIN seeds s),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM dist)
         |  WHERE rr = 1),
         |probes AS (SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
         |    FROM dist WHERE vec_id < 8)
         |  WHERE rr <= 4),
         |p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
         |    list_sum(list_transform(range(1, 65), j -> nq.emb[j] * nn.emb[j]))
         |      / (nq.nrm * nn.nrm) AS c
         |  FROM probes pr JOIN assign a USING (cid)
         |  JOIN n nq ON nq.vec_id = pr.query_id
         |  JOIN n nn ON nn.vec_id = a.vec_id
         |  WHERE a.vec_id != pr.query_id),
         |g AS (SELECT query_id, neighbor_id, max(c) AS c FROM p
         |      GROUP BY query_id, neighbor_id)
         |SELECT query_id, neighbor_id, round(c, 6) AS cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY c DESC, neighbor_id) AS rank FROM g)
         |WHERE rank <= 5""".stripMargin,
    // the oracle re-derives the TRAINED quantizer: one Lloyd pass off the
    // md5 seeds (per-cluster, per-dimension means, rounded 6dp exactly as
    // the Spark side rounds its trained centroids), then the same
    // lists/probes/top-k derivation as q_ann_ivf
    "q_ann_ivf_trained" ->
      s"""WITH $SqlEmbN,
         |ranked AS (SELECT vec_id, emb,
         |    row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS r FROM e),
         |seeds AS (SELECT r - 1 AS cid, emb AS cemb FROM ranked WHERE r <= 16),
         |dist0 AS (SELECT e.vec_id, s.cid,
         |    list_sum(list_transform(range(1, 65),
         |      j -> (e.emb[j] - s.cemb[j]) * (e.emb[j] - s.cemb[j]))) AS d
         |  FROM e CROSS JOIN seeds s),
         |assign0 AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM dist0)
         |  WHERE rr = 1),
         |memberdims AS (SELECT a.cid, j, e.emb[j] AS x
         |  FROM assign0 a JOIN e USING (vec_id) CROSS JOIN range(1, 65) jj(j)),
         |avgs AS (SELECT cid, j, round(avg(x), 6) AS ax
         |  FROM memberdims GROUP BY cid, j),
         |newcent AS (SELECT cid, list(ax ORDER BY j) AS cemb FROM avgs GROUP BY cid),
         |cent AS (SELECT s.cid,
         |    COALESCE(nc.cemb, list_transform(s.cemb, x -> round(x, 6))) AS cemb
         |  FROM seeds s LEFT JOIN newcent nc USING (cid)),
         |dist AS (SELECT e.vec_id, c.cid,
         |    list_sum(list_transform(range(1, 65),
         |      j -> (e.emb[j] - c.cemb[j]) * (e.emb[j] - c.cemb[j]))) AS d
         |  FROM e CROSS JOIN cent c),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM dist)
         |  WHERE rr = 1),
         |probes AS (SELECT vec_id AS query_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr
         |    FROM dist WHERE vec_id < 8)
         |  WHERE rr <= 4),
         |p AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
         |    list_sum(list_transform(range(1, 65), j -> nq.emb[j] * nn.emb[j]))
         |      / (nq.nrm * nn.nrm) AS c
         |  FROM probes pr JOIN assign a USING (cid)
         |  JOIN n nq ON nq.vec_id = pr.query_id
         |  JOIN n nn ON nn.vec_id = a.vec_id
         |  WHERE a.vec_id != pr.query_id),
         |g AS (SELECT query_id, neighbor_id, max(c) AS c FROM p
         |      GROUP BY query_id, neighbor_id)
         |SELECT query_id, neighbor_id, round(c, 6) AS cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY c DESC, neighbor_id) AS rank FROM g)
         |WHERE rank <= 5""".stripMargin,
    "q_embedding_neardup_lsh" ->
      s"""WITH $SqlEmbN,
         |$SqlLshBuckets,
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |        list_sum(list_transform(range(1, 65), j -> a.emb[j] * b.emb[j]))
         |          / (a.nrm * b.nrm) AS c
         |      FROM ex a JOIN ex b USING (bucket) WHERE a.vec_id < b.vec_id),
         |g AS (SELECT id_a, id_b, max(c) AS c FROM p GROUP BY id_a, id_b)
         |SELECT id_a, id_b, round(c, 6) AS cos FROM g WHERE c >= 0.30""".stripMargin,
    // assignment CTEs identical to q_ann_ivf's seeds-16 quantizer; the dup
    // rule (earliest in-threshold cluster member wins) is one self-join
    "q_semantic_dedup" ->
      s"""WITH $SqlEmbN,
         |ranked AS (SELECT vec_id, emb,
         |    row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS r FROM e),
         |seeds AS (SELECT r - 1 AS cid, emb AS cemb FROM ranked WHERE r <= 16),
         |dist AS (SELECT e.vec_id, s.cid,
         |    list_sum(list_transform(range(1, 65),
         |      j -> (e.emb[j] - s.cemb[j]) * (e.emb[j] - s.cemb[j]))) AS d
         |  FROM e CROSS JOIN seeds s),
         |assign AS (SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rr FROM dist)
         |  WHERE rr = 1),
         |m AS (SELECT a.cid, n.vec_id, n.emb, n.nrm FROM assign a JOIN n USING (vec_id))
         |SELECT x.cid, y.vec_id, min(x.vec_id) AS dup_of
         |FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
         |WHERE list_sum(list_transform(range(1, 65),
         |    j -> x.emb[j] * y.emb[j])) / (x.nrm * y.nrm) >= 0.30
         |GROUP BY x.cid, y.vec_id""".stripMargin,
    // pairs CTE chain identical to q_embedding_neardup_lsh; the component
    // labeling is min-reachable-id over the symmetrized pair graph
    "q_dup_components" ->
      s"""WITH RECURSIVE $SqlEmbN,
         |$SqlLshBuckets,
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |        list_sum(list_transform(range(1, 65), j -> a.emb[j] * b.emb[j]))
         |          / (a.nrm * b.nrm) AS c
         |      FROM ex a JOIN ex b USING (bucket) WHERE a.vec_id < b.vec_id),
         |pairs AS (SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b, max(c) AS c FROM p GROUP BY id_a, id_b) WHERE c >= 0.30),
         |nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
         |sym AS (SELECT id_a AS a, id_b AS b FROM pairs
         |        UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id)
         |SELECT id AS vec_id, min(r) AS comp FROM reach GROUP BY id""".stripMargin,
    "q_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label,
        |             list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings),
        |n AS (SELECT vec_id, label, emb,
        |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e)
        |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1, 65),
        |    j -> a.emb[j] * b.emb[j])) / (a.nrm * b.nrm), 6) AS cos
        |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(range(1, 65),
        |    j -> a.emb[j] * b.emb[j])) / (a.nrm * b.nrm) >= 0.30""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, strlen(text)::BIGINT AS n_bytes,
        | 64 + strlen(text)::BIGINT % 448 AS width,
        | 64 + (strlen(text)::BIGINT * 7) % 448 AS height,
        | 1 + strlen(text)::BIGINT % 15 AS n_frames
        |FROM documents""".stripMargin,
    "q_token_bpe" ->
      """SELECT doc_id,
        | len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+'))::BIGINT
        |   AS n_pieces,
        | len(list_distinct(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+')))::BIGINT
        |   AS n_distinct_pieces
        |FROM documents""".stripMargin,
    "q_winnow_fingerprint" -> {
      // mirrors RollingFingerprint.compute exactly, INCLUDING docs shorter
      // than k=8 chars (kk = min(k, max(n,1)): the whole text is one gram)
      // and empty docs (no gram -> no row)
      val M = 1000000007L
      val C = Iterator.iterate(1L)(x => x * 257L % M).take(8).toArray
      def terms(kk: Int, j: String) = (0 until kk).map(i =>
        s"ascii(substr(text, $j+$i, 1))::BIGINT * ${C(kk - 1 - i)}").mkString(" + ")
      val shortBranches = (1 to 7).map(kk =>
        s"WHEN n = $kk THEN [(${terms(kk, "1")}) % $M]").mkString(" ")
      s"""WITH g AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |grams AS (SELECT doc_id, CASE
         |  WHEN n >= 8 THEN list_transform(range(1, n - 6), j -> (${terms(8, "j")}) % $M)
         |  $shortBranches
         |  ELSE []::BIGINT[] END AS h FROM g),
         |wins AS (SELECT doc_id, CASE
         |  WHEN len(h) = 0 THEN []::BIGINT[]
         |  WHEN len(h) >= 4
         |  THEN list_sort(list_distinct(list_transform(range(1, len(h) - 2),
         |       j -> list_min(list_slice(h, j, j + 3)))))
         |  ELSE [list_min(h)] END AS fps FROM grams)
         |SELECT doc_id, unnest(fps) AS fp FROM wins""".stripMargin
    },
    "q_distinct_count" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin,
    "q_url_canonicalize" ->
      """SELECT doc_id, 'http://host' || (doc_id % 20) || '.test/p/' || doc_id
        |  AS canonical_url
        |FROM documents""".stripMargin,
    "q_sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('split|' || doc_id), 1, 1) < 'c' THEN 'train'
        |       WHEN substr(md5('split|' || doc_id), 1, 1) < 'e' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q_domain_cap" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5('cap|' || doc_id), doc_id) AS rk
        |  FROM documents) WHERE rk <= 10""".stripMargin,
    "q_pack_chunks" ->
      s"""WITH t0 AS (SELECT doc_id, source,
        |  len($SqlToks)::BIGINT AS tok FROM documents)
        |SELECT doc_id, source, tok,
        |  CAST(floor((sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - tok) / 256) AS BIGINT) AS chunk
        |FROM t0""".stripMargin,
    "q_decontaminate" ->
      s"""$SqlDocsWithShingles,
        |sp AS (SELECT doc_id, sh,
        |  CASE WHEN substr(md5('split|' || doc_id), 1, 1) < 'c' THEN 'train'
        |       WHEN substr(md5('split|' || doc_id), 1, 1) < 'e' THEN 'valid'
        |       ELSE 'test' END AS split FROM d),
        |tg AS (SELECT DISTINCT unnest(list_distinct(sh)) AS g FROM sp
        |       WHERE split = 'test'),
        |trg AS (SELECT doc_id, unnest(list_distinct(sh)) AS g FROM sp
        |        WHERE split = 'train'),
        |hits AS (SELECT doc_id, count(*) AS n_hits
        |         FROM trg JOIN tg USING (g) GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
        |  coalesce(h.n_hits, 0) = 0 AS clean
        |FROM sp t LEFT JOIN hits h ON t.doc_id = h.doc_id
        |WHERE t.split = 'train'""".stripMargin,
    "q_repetition" ->
      s"""WITH t0 AS (SELECT doc_id, $SqlToks AS ts FROM documents),
        |g AS (SELECT doc_id, ts, len(ts)::BIGINT AS n_tokens,
        |  list_transform(range(1, CASE WHEN len(ts) >= 2 THEN len(ts) ELSE 1 END),
        |    j -> ts[j] || ' ' || ts[j+1]) AS g2 FROM t0),
        |base AS (SELECT doc_id, n_tokens,
        |  CASE WHEN n_tokens >= 2
        |    THEN round(1.0 - len(list_distinct(g2))::DOUBLE / len(g2)::DOUBLE, 6)
        |    ELSE 0.0 END AS dup_2gram_frac FROM g),
        |tk AS (SELECT doc_id, unnest(ts) AS tk FROM t0),
        |cnt AS (SELECT doc_id, tk, count(*) AS c FROM tk GROUP BY doc_id, tk),
        |top AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c)::DOUBLE, 6)
        |          AS top_token_frac FROM cnt GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.dup_2gram_frac,
        |  coalesce(t.top_token_frac, 0.0) AS top_token_frac
        |FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id""".stripMargin,
    "q_tfidf_top" ->
      s"""WITH tk AS (SELECT doc_id, unnest($SqlToks) AS tk FROM documents),
        |tf AS (SELECT doc_id, tk, count(*) AS tf FROM tk GROUP BY doc_id, tk),
        |df AS (SELECT tk, count(DISTINCT doc_id) AS df FROM tk GROUP BY tk),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT f.doc_id, f.tk,
        |         f.tf::DOUBLE * ln(n.n::DOUBLE / d.df::DOUBLE) AS tfidf
        |       FROM tf f JOIN df d ON f.tk = d.tk CROSS JOIN n)
        |SELECT doc_id, tk AS token, round(tfidf, 6) AS tfidf, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, tk) AS rk FROM sc)
        |WHERE rk <= 3""".stripMargin,
    "q_pii_redact" ->
      s"""WITH p AS (SELECT doc_id,
        |  'user' || doc_id || '@' || source || '.com 10.0.' || (doc_id % 200)
        |    || '.' || (doc_id % 250) || ' ' || text AS ptext FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(ptext,
        |    '\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b'))::BIGINT AS n_ips,
        |  md5(regexp_replace(regexp_replace(ptext,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b', '[IP]', 'g')) AS redacted_md5
        |FROM p""".stripMargin,
    "q_passage_dedup" ->
      s"""WITH t0 AS (SELECT doc_id, $SqlToks AS ts FROM documents),
        |p AS (SELECT doc_id, u.pos AS pos, u.passage AS passage FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, ceil(len(ts)/5.0)::INT),
        |    i -> {'pos': i::INT,
        |          'passage': array_to_string(ts[i*5+1 : i*5+5], ' ')})) AS u
        |  FROM t0)),
        |r AS (SELECT doc_id, row_number() OVER (PARTITION BY passage
        |        ORDER BY doc_id, pos) AS rk FROM p)
        |SELECT doc_id, count(*) AS n_passages,
        |  sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dupes
        |FROM r GROUP BY doc_id""".stripMargin
  )
}
