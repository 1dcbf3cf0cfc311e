package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Text-analysis + deduplication operator coverage over `documents`
  * (SURVEY.md §7.5). The DuckDB oracles recompute every signature —
  * shingles, polynomial hashes, MinHash permutations, band folds,
  * SimHash bit majorities — from scratch in SQL, so signature parity
  * is verified end-to-end, not just row counts.
  */
object TextDedupQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Scale guards for the inverted-index sparse-cosine pair join
    * (`txt_sparse_cosine_pairs`). Both are ABSOLUTE, not proportional
    * — the `Dedup.MaxBucket` discipline: constants that hold at any
    * corpus size, so the worst-case pair fan-out and the integer score
    * arithmetic are bounded by construction, not by the tested scale. */
  object SparseCosine {
    /** Hard df ceiling on the postings index: a token in more than
      * MaxDf docs is dropped even when the proportional cut
      * (|docs|/10) would admit it, capping any single token's pair
      * contribution at MaxDf² ≈ 10⁸ regardless of corpus size. */
    val MaxDf = 10000L
    /** Squared-norm ceiling (≈ a 10⁶-token doc): docs above it leave
      * pairwise cosine (banding handles them). Guarantees
      * num² ≤ na²·nb² ≤ 10²⁴ by Cauchy-Schwarz, so the e6 score fits
      * DECIMAL(38,0)/HUGEINT intermediates exactly. */
    val MaxN2 = 1000000000000L
  }

  // One persisted shingle-hash frame + band index per (session, dataset):
  // dedup_minhash_bands / dedup_lsh_pairs / dedup_neardup_pipeline all
  // derive from the same materialization instead of re-tokenizing the
  // corpus per query (the round-1 bench re-ran the signature pipeline up
  // to 3×, and the re-run was what the contended-environment bench blew
  // up on). The cache is bounded: three entries per (session, dataset) —
  // the storage-backed analogue at scale is writing the index to a table.
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Drop this session's memoized index frames (benchmark hygiene: lets
    * a repeated measurement pass rebuild the index cold instead of
    * silently reusing the persisted frame from the previous pass). */
  def clearMemo(s: SparkSession): Unit =
    memo.keys.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = true))
    }

  private def docHashes(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate((s, d, "hashes"),
      Dedup.withShingleHashes(t(s, d, "documents"), "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private def bandIndex(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate((s, d, "bands"),
      Dedup.minhashBandsFromHashes(docHashes(s, d), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The substring-window index: distinct (doc_id, h, w) per document
    * over FULL-stride 48-char windows, with `is_b` flagging windows
    * whose position is ≡ 0 (mod 8) — the stride-8 subset. ONE
    * generate+hash+distinct pass, persisted (r17 optimization): the
    * three consumers (hot-window cap, both pair-join inputs) prune
    * different columns, so without the persist each got its own
    * non-reusable exchange and the corpus was re-windowed per consumer
    * (three full scans, measured). The storage-backed analogue at
    * scale is writing the window index to a table once. */
  private def windowIndex(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate((s, d, "subwin"),
      Dedup.spread(t(s, d, "documents"))
        .select(col("doc_id"),
          expr("graft_char_windows(text, 48, 1)").as(Seq("win_idx", "w")))
        .groupBy(col("doc_id"), xxhash64(col("w")).as("h"), col("w"))
        .agg(max(pmod(col("win_idx"), lit(8)) === 0).as("is_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** LSH candidates → exact-Jaccard rescore pairs (shared by the
    * near-dup report query and the dedup_apply keep-list). */
  private[queries] def neardupPairs(s: SparkSession, d: String): DataFrame = {
    val cands = Dedup.lshCandidatePairs(bandIndex(s, d), "doc_id")
    val hs = docHashes(s, d)
      .select(col("doc_id"), array_distinct(col("shingle_hashes")).as("hs"))
    cands
      .join(hs.select(col("doc_id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(hs.select(col("doc_id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), Dedup.jaccardCol.as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  // DuckDB-side building blocks mirroring TextFunctions/Dedup exactly.
  private[queries] val dkClean = "lower(regexp_replace(text, '[^ -~]', '', 'g'))"
  private[queries] def dkPoly(e: String) =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), ch -> ord(ch)::BIGINT)), " +
      s"(a, x) -> (a * 31 + x) % 1000000007)"
  private[queries] val dkTokens = "regexp_split_to_array(trim(text), '\\s+')"
  private def dkShingles(src: String) =
    s"list_distinct(list_transform(range(1, length($src) - 1), i -> substr($src, i::INT, 3)))"
  // token 3-shingles of the cleaned text (mirrors tokenShinglesSql)
  private def dkTokShingles(src: String) =
    s"list_distinct(list_transform(range(1, len(regexp_split_to_array(trim($src), '\\s+')) - 1), " +
      s"i -> regexp_split_to_array(trim($src), '\\s+')[i] || ' ' || " +
      s"regexp_split_to_array(trim($src), '\\s+')[i+1] || ' ' || " +
      s"regexp_split_to_array(trim($src), '\\s+')[i+2]))"

  /** CDC chunking CTE prefix shared by the cdc_* oracles: `docs`
    * (trimmed non-empty), `wins` (per-position rolling-hash boundary
    * set, recomputed O(n·w)), `cuts` (content boundaries + forced doc
    * end). Terminal CTEs are query-specific. */
  private def dkCdcCtes: String =
    """docs AS (SELECT doc_id, trim(text) AS tx FROM documents
      |  WHERE length(trim(text)) >= 1),
      |wins AS (SELECT doc_id, i + 16 AS p FROM (
      |    SELECT doc_id, tx, unnest(range(0, length(tx) - 15)) AS i FROM docs)
      |  WHERE list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 17),
      |      j -> ascii(substr(tx, (i + j)::INT, 1))::BIGINT)),
      |    (h, c) -> (h * 257 + c) % 1000003) % 64 = 0),
      |cuts AS (SELECT doc_id, p FROM wins
      |  UNION SELECT doc_id, length(tx) FROM docs)""".stripMargin

  /** Full near-dup CTE chain (hashes → signatures → capped bands →
    * candidates → Jaccard-scored pairs), shared by the near-dup report
    * and dedup_apply oracles. Terminal CTE: `scored(id_a, id_b, jaccard)`. */
  private[queries] def dkNeardupCtes: String =
    s"""hh AS (SELECT doc_id,
       |  list_distinct(list_transform(${dkTokShingles(dkClean)}, sh -> ${dkPoly("sh")})) AS h
       |  FROM documents),
       |sig AS (SELECT doc_id,
       |  list_transform(range(0, ${Dedup.NumHashes}), i ->
       |    list_min(list_transform(h, x -> ((2*i + 3) * x + (7919*i + 13)) % ${Dedup.MinhashP}))) AS sg
       |  FROM hh WHERE len(h) > 0),
       |bands AS (SELECT doc_id, band,
       |  list_reduce(list_prepend(0::BIGINT,
       |    sg[band*${Dedup.RowsPerBand} + 1 : band*${Dedup.RowsPerBand} + ${Dedup.RowsPerBand}]),
       |    (a, x) -> (a * 31 + x) % ${Dedup.BandP}) AS band_hash
       |  FROM sig, range(0, ${Dedup.Bands}) tt(band)
       |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${Dedup.MaxBucket}),
       |cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |scored AS (
       |SELECT id_a, id_b, round((len(list_intersect(x.h, y.h))::DOUBLE /
       |  (len(x.h) + len(y.h) - len(list_intersect(x.h, y.h))))::DECIMAL(18,12), 6)::DOUBLE AS jaccard
       |FROM cands JOIN hh x ON x.doc_id = id_a JOIN hh y ON y.doc_id = id_b)""".stripMargin

  // ── Learned-merges BPE (round-6): deterministic training on the
  //    corpus vocabulary, replayed by the oracle as an unrolled CTE
  //    chain (one s/p/m/v block per merge round) exactly like the
  //    trained-IVF Lloyd rounds. ──
  private val BpeM = 6

  private def bpeWords(s: SparkSession, d: String): DataFrame =
    Dedup.stageThenSpread(t(s, d, "documents"),
        "__toks" -> expr(TextFunctions.tokensSql("text")))
      .select(col("doc_id"), explode(col("__toks")).as("word"))
      // guards, mirrored in the oracle's words CTE: (a) tokensSql
      // splits RAW text, so a pathological token containing U+001F
      // must stay out of the symbol frames; (b) an empty-string token
      // (split of an empty doc) must too — Spark's sequence(1, 0) is
      // DESCENDING [1, 0], which would fabricate two phantom symbols
      // where the oracle's range(0) correctly yields none
      .filter(!col("word").contains(graft.operators.Bpe.D) &&
        length(col("word")) > 0)

  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    bpeWords(s, d).groupBy("word").agg(count(lit(1)).as("freq"))

  // merges are deterministic values (not persisted frames), so the
  // memo never goes stale and bench hygiene doesn't need to clear it
  private val bpeMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[graft.operators.Bpe.Merge]]
  private def bpeMerges(s: SparkSession, d: String): Seq[graft.operators.Bpe.Merge] =
    bpeMemo.getOrElseUpdate((s, d),
      graft.operators.Bpe.train(bpeVocab(s, d), "word", "freq", BpeM))

  /** DuckDB replay of Bpe.train: words → vocab → v0 (char frames) →
    * per-round (syms, pair counts, argmax merge, applied frames). */
  private def dkBpeCtes: String = {
    val d1 = "chr(31)"
    val dd = "chr(31) || chr(31)"
    val init =
      s"""words AS (SELECT doc_id, word FROM (
         |  SELECT doc_id, unnest($dkTokens) AS word FROM documents)
         |  WHERE word NOT LIKE '%' || $d1 || '%' AND length(word) > 0),
         |vocab AS (SELECT word, count(*) AS freq FROM words GROUP BY 1),
         |v0 AS (SELECT word, freq, $d1 ||
         |  array_to_string(list_transform(range(length(word)), i -> substr(word, i + 1, 1)), $dd)
         |  || $d1 AS enc FROM vocab)""".stripMargin
    val rounds = (1 to BpeM).map { r =>
      s"""s$r AS (SELECT word, freq,
         |  string_split(substr(enc, 2, length(enc) - 2), $dd) AS syms FROM v${r - 1}),
         |p$r AS (SELECT a, b, sum(freq)::BIGINT AS cnt FROM (
         |  SELECT freq, syms[i + 1] AS a, syms[i + 2] AS b FROM (
         |    SELECT freq, syms, unnest(range(len(syms) - 1)) AS i FROM s$r
         |    WHERE len(syms) >= 2)) GROUP BY 1, 2),
         |m$r AS (SELECT a, b FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |v$r AS (SELECT v.word, v.freq,
         |  CASE WHEN m.a IS NULL THEN v.enc
         |       ELSE replace(v.enc, $d1 || m.a || $dd || m.b || $d1, $d1 || m.a || m.b || $d1)
         |  END AS enc
         |  FROM v${r - 1} v LEFT JOIN m$r m ON true)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  val defs: Seq[QueryDef] = Seq(

    // ── Token counting ──
    QueryDef(
      "txt_tokens",
      "whitespace token counts + distinct tokens per document",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("__toks", expr(TextFunctions.tokensSql("text")))
          .select(
            col("doc_id"),
            TextFunctions.tokenCount("__toks").as("n_tokens"),
            TextFunctions.distinctTokenCount("__toks").as("n_distinct"),
            char_length(col("text")).as("n_chars_calc")),
      Some(s"""SELECT doc_id, len($dkTokens) AS n_tokens,
              |len(list_distinct($dkTokens)) AS n_distinct,
              |length(text) AS n_chars_calc FROM documents""".stripMargin)),

    // ── Corpus length profile off the QSketch quantile sketch: per-
    //    language p50/p90 token counts for curriculum/batching
    //    decisions, read from the mergeable integer histogram instead
    //    of a full per-language rank sort — and, unlike
    //    approx_percentile, hash-exact against the SQL replay. ──
    QueryDef(
      "txt_length_quantiles",
      "per-language token-length p50/p90 from the integer quantile sketch",
      (s, d) => {
        val toks = t(s, d, "documents").select(col("lang").as("grp"),
          expr(s"greatest(CAST(size(${TextFunctions.tokensSql("text")}) AS BIGINT), 1)")
            .as("c"))
        graft.operators.QSketch.quantiles(
            graft.operators.QSketch.histogram(toks, "grp", "c"), Seq(50, 90))
          .orderBy("grp", "q")
      },
      Some(s"""WITH cents AS (SELECT lang AS grp,
              |    greatest(CAST(len($dkTokens) AS BIGINT), 1) AS c FROM documents),
              |b AS (SELECT grp, c, length(bin(c)) - 1 AS e FROM cents),
              |h AS (SELECT grp, e * 16 + ((c - (1::BIGINT << e)) * 16) // (1::BIGINT << e) AS bucket,
              |    count(*) AS cnt FROM b GROUP BY 1, 2),
              |n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
              |qs AS (SELECT grp, n, q FROM n, (VALUES (50), (90)) t(q)),
              |ranked AS (SELECT grp, bucket, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM h),
              |pick AS (SELECT qs.grp, qs.q, qs.n, min(bucket) AS bucket
              |  FROM qs JOIN ranked ON ranked.grp = qs.grp AND ranked.cum >= (qs.q * qs.n + 99) // 100
              |  GROUP BY 1, 2, 3)
              |SELECT grp, q, n, (1::BIGINT << (bucket // 16))
              |    + ((bucket % 16) * (1::BIGINT << (bucket // 16))) // 16 AS est
              |FROM pick ORDER BY 1, 2""".stripMargin)),

    // ── The HASHING TRICK (feature hashing): fixed-width sparse
    //    vectorization with no vocabulary pass — token → slot =
    //    polyhash(token) mod 64, per-doc term frequencies per slot.
    //    This is how text becomes model input at corpus scale when a
    //    vocabulary table is itself a bottleneck: stateless, one narrow
    //    projection + one map-side-combinable count, identical output
    //    for any data layout. Integer end-to-end. ──
    QueryDef(
      "txt_feature_hash",
      "hashing-trick sparse vectorization: per-doc term frequency over 64 hash slots",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            explode(expr(graft.functions.TextFunctions.tokensSql("text"))).as("tok"))
          .select(col("doc_id"), expr("pmod(graft_poly(tok), 64)").as("slot"))
          .groupBy("doc_id", "slot").agg(count(lit(1)).as("tf"))
      },
      Some(s"""SELECT doc_id, slot, count(*) AS tf FROM (
              |  SELECT doc_id, ${dkPoly("tok")} % 64 AS slot FROM (
              |    SELECT doc_id, unnest($dkTokens) AS tok FROM documents))
              |GROUP BY 1, 2""".stripMargin)),

    // ── BPE-ish pre-tokenizer counts ──
    //    GPT-2-style pre-tokenization classes (contraction suffixes,
    //    space-prefixed letter runs, digit runs, punctuation runs,
    //    whitespace) without lookahead so the same RE2-compatible
    //    pattern runs identically in Spark (Java regex) and DuckDB
    //    (RE2) — both leftmost-first alternation.
    QueryDef(
      "txt_tokens_bpe",
      "BPE-ish pre-tokenizer token counts (GPT-2-style regex classes)",
      (s, d) =>
        graft.operators.Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"),
              lit("'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"),
              lit(0))).as("n_bpe_tokens"),
            char_length(col("text")).as("n_chars")),
      Some("""SELECT doc_id,
             |len(regexp_extract_all(text,
             |  '''(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+')) AS n_bpe_tokens,
             |length(text) AS n_chars
             |FROM documents""".stripMargin)),

    // ── Learned BPE merge table: the training output itself, oracled.
    //    Each round's argmax (count desc, pair asc — a total order on
    //    integers and strings) is replayed by the m{r} CTEs, so any
    //    divergence in pair statistics, tie-breaks, or replace
    //    semantics turns the row red. ──
    QueryDef(
      "txt_bpe_merges",
      s"learned BPE merge table ($BpeM greedy rounds, vocabulary-frequency weighted)",
      (s, d) => {
        import s.implicits._
        bpeMerges(s, d).map(mg => (mg.rank.toLong, mg.a, mg.b))
          .toDF("rank", "a", "b")
      },
      Some(s"WITH $dkBpeCtes\n" +
        (1 to BpeM).map(r => s"SELECT ${r}::BIGINT AS rank, a, b FROM m$r")
          .mkString("\nUNION ALL\n"))),

    // ── Merged-token budgets: per-document token counts in LEARNED
    //    BPE units (what training pipelines actually budget in), via a
    //    broadcast join of the word → n_subwords application table
    //    against the token stream — the 100 TB shape: training state
    //    stays vocabulary-sized, the corpus is touched once. ──
    QueryDef(
      "txt_tokens_bpe_learned",
      "per-document merged-BPE token counts (learned merge table applied)",
      (s, d) => {
        val sub = graft.operators.Bpe.subwordCounts(
          bpeVocab(s, d), "word", "freq", bpeMerges(s, d))
        bpeWords(s, d)
          .join(broadcast(sub), "word")
          .groupBy("doc_id").agg(sum("n_subwords").as("n_tokens_bpe"))
      },
      // concatenated, NOT an outer stripMargin: the embedded CTE chain
      // has lines beginning with ||, which stripMargin would truncate
      Some(s"WITH $dkBpeCtes,\n" +
        s"""sub AS (SELECT word,
           |  len(string_split(substr(enc, 2, length(enc) - 2), chr(31) || chr(31)))::BIGINT AS n_subwords
           |  FROM v$BpeM)
           |SELECT w.doc_id, sum(sub.n_subwords)::BIGINT AS n_tokens_bpe
           |FROM words w JOIN sub ON sub.word = w.word GROUP BY 1""".stripMargin)),

    // ── Quality scoring ──
    QueryDef(
      "txt_quality",
      "punctuation / stopword / token-length quality heuristics",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        graft.operators.Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(
            col("doc_id"),
            TextFunctions.punctRatio("text").as("punct_ratio"),
            TextFunctions.stopwordRatio("__toks").as("stop_ratio"),
            TextFunctions.meanTokenLen("text", "__toks").as("mean_tok_len"))
      },
      Some(s"""SELECT doc_id,
              |round((length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
              |  / greatest(length(text), 1))::DECIMAL(18,12), 6)::DOUBLE AS punct_ratio,
              |round((len(list_filter($dkTokens, t -> list_contains(${TextFunctions.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, t)))::DOUBLE
              |  / greatest(len($dkTokens), 1))::DECIMAL(18,12), 6)::DOUBLE AS stop_ratio,
              |round((length(replace(text, ' ', ''))::DOUBLE
              |  / greatest(len($dkTokens), 1))::DECIMAL(18,12), 6)::DOUBLE AS mean_tok_len
              |FROM documents""".stripMargin),
      bench = true),

    // ── Language ID heuristic ──
    QueryDef(
      "txt_langid",
      "stopword-hit argmax language ID (n-gram heuristic class)",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        graft.operators.Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"), TextFunctions.langId("__toks").as("pred_lang"))
      },
      Some {
        val counts = TextFunctions.LangStopwords.map { case (lang, ws) =>
          lang -> s"len(list_filter($dkTokens, t -> list_contains(${ws.map(w => s"'$w'").mkString("[", ", ", "]")}, t)))"
        }
        val others = (l: String) => counts.filter(_._1 != l).map(_._2).mkString("greatest(", ", ", ")")
        val cases = counts.map { case (l, e) => s"WHEN $e >= ${others(l)} THEN '$l'" }.mkString(" ")
        s"SELECT doc_id, CASE $cases ELSE 'und' END AS pred_lang FROM documents"
      }),

    // ── Document fingerprint (rolling hash) ──
    QueryDef(
      "txt_fingerprint",
      "polynomial rolling-hash fingerprint of cleaned text",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        graft.operators.Dedup.stageThenSpread(t(s, d, "documents"),
          "__clean" -> expr(s"lower(${TextFunctions.cleanAsciiSql("text")})"))
          .select(col("doc_id"), TextFunctions.polyHash("__clean").as("fp"))
      },
      Some(s"SELECT doc_id, ${dkPoly(dkClean)} AS fp FROM documents")),

    // ── Exact dedup ──
    QueryDef(
      "dedup_exact",
      "exact duplicate groups via md5 hash-groupBy",
      (s, d) => Dedup.exactGroups(t(s, d, "documents"), "text", "doc_id"),
      Some("""SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n
             |FROM documents GROUP BY md5(text)""".stripMargin),
      bench = true),

    // ── n-gram Jaccard near-dup scoring (adjacent-id pairs) ──
    QueryDef(
      "dedup_ngram_jaccard",
      "char-3-gram Jaccard similarity over paired documents",
      (s, d) => {
        val sh = graft.operators.Dedup.stageThenSpread(t(s, d, "documents"),
          "__clean" -> expr(s"lower(${TextFunctions.cleanAsciiSql("text")})"))
          .select(col("doc_id"), expr(TextFunctions.shinglesSql("__clean", 3)).as("sh"))
        val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        a.join(b, col("doc_a") + 1 === col("doc_b"))
          .select(col("doc_a"), col("doc_b"), Dedup.jaccardCol.as("jaccard"))
      },
      Some(s"""WITH sh AS (SELECT doc_id, ${dkShingles(dkClean)} AS s FROM documents)
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |round((len(list_intersect(a.s, b.s))::DOUBLE /
              |  (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))))::DECIMAL(18,12), 6)::DOUBLE AS jaccard
              |FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id""".stripMargin)),

    // ── MinHash LSH index ──
    QueryDef(
      "dedup_minhash_bands",
      "MinHash signatures folded into LSH band buckets",
      (s, d) => bandIndex(s, d),
      Some(s"""WITH hh AS (SELECT doc_id,
              |  list_transform(${dkTokShingles(dkClean)}, sh -> ${dkPoly("sh")}) AS h
              |  FROM documents),
              |sig AS (SELECT doc_id,
              |  list_transform(range(0, ${Dedup.NumHashes}), i ->
              |    list_min(list_transform(h, x -> ((2*i + 3) * x + (7919*i + 13)) % ${Dedup.MinhashP}))) AS sg
              |  FROM hh WHERE len(h) > 0)
              |SELECT doc_id, band,
              |  list_reduce(list_prepend(0::BIGINT,
              |    sg[band*${Dedup.RowsPerBand} + 1 : band*${Dedup.RowsPerBand} + ${Dedup.RowsPerBand}]),
              |    (a, x) -> (a * 31 + x) % ${Dedup.BandP}) AS band_hash
              |FROM sig, range(0, ${Dedup.Bands}) tt(band)""".stripMargin),
      bench = true),

    // ── LSH candidate pairs ──
    QueryDef(
      "dedup_lsh_pairs",
      "near-dup candidate pairs from shared LSH band buckets",
      (s, d) => Dedup.lshCandidatePairs(bandIndex(s, d), "doc_id"),
      Some(s"""WITH hh AS (SELECT doc_id,
              |  list_transform(${dkTokShingles(dkClean)}, sh -> ${dkPoly("sh")}) AS h
              |  FROM documents),
              |sig AS (SELECT doc_id,
              |  list_transform(range(0, ${Dedup.NumHashes}), i ->
              |    list_min(list_transform(h, x -> ((2*i + 3) * x + (7919*i + 13)) % ${Dedup.MinhashP}))) AS sg
              |  FROM hh WHERE len(h) > 0),
              |bands AS (SELECT doc_id, band,
              |  list_reduce(list_prepend(0::BIGINT,
              |    sg[band*${Dedup.RowsPerBand} + 1 : band*${Dedup.RowsPerBand} + ${Dedup.RowsPerBand}]),
              |    (a, x) -> (a * 31 + x) % ${Dedup.BandP}) AS band_hash
              |  FROM sig, range(0, ${Dedup.Bands}) tt(band)
              |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${Dedup.MaxBucket})
              |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |FROM bands a JOIN bands b
              |ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id""".stripMargin),
      bench = true),

    // ── Full near-dup pipeline: LSH candidates → exact Jaccard rescore ──
    QueryDef(
      "dedup_neardup_pipeline",
      "MinHash-LSH candidate generation + Jaccard rescore at 0.8 (the production near-dup shape)",
      (s, d) => neardupPairs(s, d),
      Some(s"""WITH $dkNeardupCtes
              |SELECT * FROM scored WHERE jaccard >= 0.8""".stripMargin),
      bench = true),

    // ── Applying the dedup: the kept corpus. Greedy pair-break (drop
    //    the higher id of every verified near-dup pair) — one left-anti
    //    join, the standard production policy when full connected-
    //    components clustering isn't warranted. ──
    QueryDef(
      "dedup_apply",
      "kept document ids after exact + near-dup removal (greedy pair-break)",
      (s, d) => {
        val drop = neardupPairs(s, d).select(col("id_b").as("doc_id")).distinct()
        t(s, d, "documents").select("doc_id")
          .join(drop, Seq("doc_id"), "left_anti")
      },
      Some(s"""WITH $dkNeardupCtes
              |SELECT doc_id FROM documents
              |WHERE doc_id NOT IN (SELECT id_b FROM scored WHERE jaccard >= 0.8)""".stripMargin)),

    // ── Duplicate clusters: connected components over verified pairs.
    //    Distributed min-label propagation (one shuffle per round, no
    //    driver collect); the DuckDB oracle closes the same pair set
    //    transitively with a recursive CTE, so cluster assignment is
    //    verified end-to-end including convergence. ──
    QueryDef(
      "dedup_components",
      "connected-component cluster ids over verified near-dup pairs",
      (s, d) =>
        graft.operators.Components.connectedComponents(neardupPairs(s, d), "id_a", "id_b", edgesDistinct = true)
          .select(col("id").as("doc_id"), col("component")),
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst)
              |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin),
      bench = true),

    // ── INCREMENTAL cluster maintenance: the pair set split into a
    //    "stored" partition (clustered once) and an arriving batch
    //    folded in via Components.mergeIncremental — CC runs only on
    //    the contracted batch graph, the store is remapped by label.
    //    Equality with the full rebuild is the operator's contract, so
    //    the oracle IS the full-rebuild recursive CTE of
    //    dedup_components verbatim. ──
    QueryDef(
      "dedup_components_incremental",
      "cluster ids maintained incrementally (stored partition + folded batch) == full rebuild",
      (s, d) => {
        val pairs = neardupPairs(s, d).localCheckpoint(true)
        val oldPairs = pairs.filter((col("id_a") + col("id_b")) % 3 =!= 0)
        val batch = pairs.filter((col("id_a") + col("id_b")) % 3 === 0)
        val stored = graft.operators.Components
          .connectedComponents(oldPairs, "id_a", "id_b", edgesDistinct = true)
          .localCheckpoint(true)
        graft.operators.Components.mergeIncremental(stored, batch, "id_a", "id_b")
          .select(col("id").as("doc_id"), col("component"))
      },
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst)
              |SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id""".stripMargin)),

    // ── Applying the dedup at cluster granularity: keep exactly one
    //    representative (the min id) per duplicate cluster. Differs from
    //    the greedy pair-break on transitive chains: pairs (2,3),(1,3)
    //    greedily keep {1,2} but the cluster {1,2,3} keeps only {1}. ──
    QueryDef(
      "dedup_apply_cc",
      "kept document ids keeping one representative per duplicate cluster",
      (s, d) => {
        val comp = graft.operators.Components
          .connectedComponents(neardupPairs(s, d), "id_a", "id_b", edgesDistinct = true)
        val drop = comp.filter(col("component") < col("id"))
          .select(col("id").as("doc_id"))
        t(s, d, "documents").select("doc_id")
          .join(drop, Seq("doc_id"), "left_anti")
      },
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst)
              |SELECT doc_id FROM documents WHERE doc_id NOT IN (
              |  SELECT id FROM (SELECT id, min(r) AS component FROM reach GROUP BY id)
              |  WHERE component < id)""".stripMargin)),

    // ── Containment similarity: the asymmetric dup signal — LSH
    //    candidate pairs scored by |A∩B|/|A| in BOTH directions, so a
    //    short document embedded in a longer one surfaces (containment
    //    ≈ 1) even where symmetric Jaccard stays below threshold.
    //    Shares the persisted hash frame + band index. ──
    QueryDef(
      "dedup_containment",
      "LSH candidate pairs with directional shingle containment >= 0.5",
      (s, d) => {
        val cands = Dedup.lshCandidatePairs(bandIndex(s, d), "doc_id")
        val hs = docHashes(s, d)
          .select(col("doc_id"), array_distinct(col("shingle_hashes")).as("hs"))
        cands
          .join(hs.select(col("doc_id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
          .join(hs.select(col("doc_id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            Dedup.containmentCol.as("cont_a_in_b"),
            expr("CAST(round(CAST(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / size(sh_b) AS DECIMAL(18,12)), 6) AS DOUBLE)")
              .as("cont_b_in_a"))
          .filter(col("cont_a_in_b") >= 0.5 || col("cont_b_in_a") >= 0.5)
      },
      Some(s"""WITH $dkNeardupCtes
              |SELECT * FROM (
              |  SELECT id_a, id_b,
              |    round((len(list_intersect(x.h, y.h))::DOUBLE / len(x.h))::DECIMAL(18,12), 6)::DOUBLE AS cont_a_in_b,
              |    round((len(list_intersect(x.h, y.h))::DOUBLE / len(y.h))::DECIMAL(18,12), 6)::DOUBLE AS cont_b_in_a
              |  FROM cands JOIN hh x ON x.doc_id = id_a JOIN hh y ON y.doc_id = id_b)
              |WHERE cont_a_in_b >= 0.5 OR cont_b_in_a >= 0.5""".stripMargin)),

    // ── TF-IDF top terms: the two-pass learned-statistics shape — pass
    //    1 learns corpus document frequencies, pass 2 scores each
    //    document's terms against them. The idf weight is the RATIONAL
    //    (N+1)/(df+1) (no logarithm): IEEE division and multiply are
    //    exactly specified, so scores — and therefore the top-3 ranking
    //    — are bit-identical across engines, where ln() could differ in
    //    the last ulp and flip near-ties. ──
    QueryDef(
      "txt_tfidf_topterms",
      "top-3 terms per document by rational tf-idf (tf * (N+1)/(df+1))",
      (s, d) => {
        val toks = Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"), explode(col("__toks")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df_cnt"))
        val n = t(s, d, "documents").agg(count(lit(1)).as("__n"))
        // rank on the RAW score (IEEE-exact, identical in DuckDB), not
        // the rounded one — rounding before ranking could merge scores
        // that the oracle's unrounded ORDER BY still distinguishes
        tf.join(dfc, Seq("term"))
          .crossJoin(broadcast(n))
          .withColumn("__raw",
            col("tf").cast("double") *
              ((col("__n") + 1).cast("double") / (col("df_cnt") + 1).cast("double")))
          .withColumn("score",
            round(col("__raw").cast("decimal(18,12)"), 6).cast("double"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
              .orderBy(col("__raw").desc, col("term"))))
          .filter(col("rn") <= 3)
          .select("doc_id", "term", "tf", "df_cnt", "score")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($dkTokens) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
              |dfc AS (SELECT term, count(*) AS df_cnt FROM tf GROUP BY 1),
              |n AS (SELECT count(*) AS nd FROM documents)
              |SELECT doc_id, term, tf, df_cnt, score FROM (
              |  SELECT doc_id, term, tf, df_cnt,
              |    round((tf::DOUBLE * ((nd + 1)::DOUBLE / (df_cnt + 1)::DOUBLE))::DECIMAL(18,12), 6)::DOUBLE AS score,
              |    row_number() OVER (PARTITION BY doc_id ORDER BY
              |      tf::DOUBLE * ((nd + 1)::DOUBLE / (df_cnt + 1)::DOUBLE) DESC, term) AS rn
              |  FROM tf JOIN dfc USING (term) CROSS JOIN n)
              |WHERE rn <= 3""".stripMargin)),

    // ── BM25 lexical retrieval (Robertson/Lucene form): the sparse
    //    half of the hybrid stack hybrid_rrf_fusion fuses. Shape is the
    //    production one — a term-keyed posting-list join (query terms
    //    broadcast, df/doclen side tables, corpus stats a 1-row
    //    broadcast), so cost scales with posting lists hit, never the
    //    corpus. Exactness: idf = ln(1 + (N−df+½)/(df+½)) quantizes
    //    through DECIMAL(18,12)→6 digits immediately after the ln (the
    //    one libm call; everything else is IEEE-exact rational
    //    arithmetic), each term's contribution quantizes to
    //    DECIMAL(18,8), and the doc score is an order-free exact
    //    DECIMAL sum — so ranking ties break identically in any
    //    engine. ──
    QueryDef(
      "txt_bm25_topk",
      "BM25 top-5 docs per query (k1=1.2, b=0.75) via posting-list join",
      (s, d) => {
        import s.implicits._
        val qs = Seq((0L, "spark hash join"), (1L, "stream window agg"),
          (2L, "fast vector scan"), (3L, "customer query filter"))
          .toDF("query_id", "qtext")
        graft.operators.Lexical.bm25(t(s, d, "documents"), qs, 5)
      },
      Some(s"""WITH qs AS (SELECT * FROM (VALUES (0, 'spark hash join'),
              |    (1, 'stream window agg'), (2, 'fast vector scan'),
              |    (3, 'customer query filter')) v(query_id, qtext)),
              |qterms AS (SELECT query_id::BIGINT AS query_id,
              |    unnest(list_distinct(string_split(qtext, ' '))) AS term FROM qs),
              |toks AS (SELECT doc_id, unnest($dkTokens) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
              |dfc AS (SELECT term, count(*) AS df_cnt FROM tf GROUP BY 1),
              |dlen AS (SELECT doc_id, len($dkTokens)::BIGINT AS dl FROM documents),
              |st AS (SELECT count(*) AS n, sum(dl)::BIGINT AS tot FROM dlen),
              |contrib AS (SELECT query_id, t.doc_id,
              |    round((round((ln(1.0::DOUBLE + (n::DOUBLE - df_cnt::DOUBLE + 0.5::DOUBLE)
              |        / (df_cnt::DOUBLE + 0.5::DOUBLE)))::DECIMAL(18,12), 6)::DOUBLE
              |      * ((tf::DOUBLE * 2.2::DOUBLE) / (tf::DOUBLE + 1.2::DOUBLE
              |        * (0.25::DOUBLE + 0.75::DOUBLE * (dl::DOUBLE / (tot::DOUBLE / n::DOUBLE))))))::DECIMAL(18,12),
              |      8)::DECIMAL(18,8) AS c8
              |  FROM tf t JOIN qterms USING (term) JOIN dfc USING (term)
              |    JOIN dlen ON dlen.doc_id = t.doc_id CROSS JOIN st),
              |scored AS (SELECT query_id, doc_id, sum(c8) AS sd, count(*) AS n_terms
              |  FROM contrib GROUP BY 1, 2)
              |SELECT query_id, doc_id, n_terms, round(sd::DOUBLE, 6) AS score,
              |  CAST(row_number() OVER (PARTITION BY query_id
              |    ORDER BY sd DESC, doc_id) AS INT) AS rnk
              |FROM scored QUALIFY rnk <= 5""".stripMargin)),

    // ── The ONLINE BM25 serving path as a driver-visible row: the
    //    same queries through Lexical.bm25Serve (impact-index join +
    //    single ScoreTopKAgg heap — the streaming plan) must reproduce
    //    the batch ranking, scores included, against the DuckDB
    //    replay. Pins the serve plan's integer arithmetic per round. ──
    QueryDef(
      "txt_bm25_serve",
      "BM25 online-serving path (impact index + heap aggregate) top-5 per query",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val post = graft.operators.Lexical.postings(docs)
        val dl = graft.operators.Lexical.doclens(docs)
        val idx = graft.operators.Lexical.impactIndex(post, dl,
          graft.operators.Lexical.termstats(post),
          graft.operators.Lexical.corpusStats(dl))
        val qs = Seq((0L, "spark hash join"), (1L, "stream window agg"),
          (2L, "fast vector scan"), (3L, "customer query filter"))
          .toDF("query_id", "qtext")
        graft.operators.Lexical.bm25Serve(qs, idx, 5)
      },
      Some(s"""WITH qs AS (SELECT * FROM (VALUES (0, 'spark hash join'),
              |    (1, 'stream window agg'), (2, 'fast vector scan'),
              |    (3, 'customer query filter')) v(query_id, qtext)),
              |qterms AS (SELECT query_id::BIGINT AS query_id,
              |    unnest(list_distinct(string_split(qtext, ' '))) AS term FROM qs),
              |toks AS (SELECT doc_id, unnest($dkTokens) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
              |dfc AS (SELECT term, count(*) AS df_cnt FROM tf GROUP BY 1),
              |dlen AS (SELECT doc_id, len($dkTokens)::BIGINT AS dl FROM documents),
              |st AS (SELECT count(*) AS n, sum(dl)::BIGINT AS tot FROM dlen),
              |contrib AS (SELECT query_id, t.doc_id,
              |    round((round((ln(1.0::DOUBLE + (n::DOUBLE - df_cnt::DOUBLE + 0.5::DOUBLE)
              |        / (df_cnt::DOUBLE + 0.5::DOUBLE)))::DECIMAL(18,12), 6)::DOUBLE
              |      * ((tf::DOUBLE * 2.2::DOUBLE) / (tf::DOUBLE + 1.2::DOUBLE
              |        * (0.25::DOUBLE + 0.75::DOUBLE * (dl::DOUBLE / (tot::DOUBLE / n::DOUBLE))))))::DECIMAL(18,12),
              |      8)::DECIMAL(18,8) AS c8
              |  FROM tf t JOIN qterms USING (term) JOIN dfc USING (term)
              |    JOIN dlen ON dlen.doc_id = t.doc_id CROSS JOIN st),
              |scored AS (SELECT query_id, doc_id, sum(c8) AS sd
              |  FROM contrib GROUP BY 1, 2)
              |SELECT query_id,
              |  CAST(row_number() OVER (PARTITION BY query_id
              |    ORDER BY sd DESC, doc_id) AS INT) AS rnk,
              |  doc_id, round(sd::DOUBLE, 6) AS score
              |FROM scored QUALIFY rnk <= 5""".stripMargin),
      bench = true),

    // ── FILTERED lexical retrieval (r16 — the BM25 twin of the
    //    filtered-ANN family): the standing index folds document
    //    metadata onto its per-doc doclens table (ATTR_COLS pin +
    //    attrstats, the vector-store discipline), and searchStore's
    //    predicate restricts CANDIDATES below the query-term join
    //    while scoring statistics stay corpus-level — Lucene
    //    filtered-query semantics, so a doc scores identically
    //    filtered or not. Two selectivities (~44% lang='en', ~5%
    //    source='src7'); the online impact-index serve with a
    //    docFilter must reproduce the store ranking row for row. ──
    QueryDef(
      "bm25_filtered_topk",
      "filtered BM25 off the standing index at ~44% and ~5% selectivity; online docFilter twin equal",
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val base = QueryDef.tempStoreDir("graft_bm25attr")
        Seq(0L, 1L).foreach(b => graft.streaming.DocStreams.indexFoldBatch(
          docs.filter(pmod(col("doc_id"), lit(2)) === b), base, b,
          attrCols = Seq("lang", "source")))
        val qs = Seq((0L, "spark hash join"), (1L, "stream window agg"),
          (2L, "fast vector scan"), (3L, "customer query filter"))
          .toDF("query_id", "qtext")
        def at(sel: String, pred: String) =
          graft.operators.Lexical.searchStore(s, base, qs, 5,
              predicate = Some(pred))
            .withColumn("sel", lit(sel))
            .select("sel", "query_id", "doc_id", "n_terms", "score", "rnk")
        val out = at("lang_en", "lang = 'en'")
          .unionByName(at("src7", "source = 'src7'"))
        // online twin: the impact index pruned by a survivor-id frame
        // must reproduce the store ranking (scores included)
        val post = graft.operators.Lexical.postings(docs)
        val dl = graft.operators.Lexical.doclens(docs)
        val idx = graft.operators.Lexical.impactIndex(post, dl,
          graft.operators.Lexical.termstats(post),
          graft.operators.Lexical.corpusStats(dl))
        val served = graft.operators.Lexical.bm25Serve(qs, idx, 5,
            docFilter = Some(docs.filter(expr("lang = 'en'")).select("doc_id")))
          .select("query_id", "doc_id", "rnk", "score")
        val store = out.filter(col("sel") === "lang_en")
          .select("query_id", "doc_id", "rnk", "score")
        require(store.exceptAll(served).isEmpty && served.exceptAll(store).isEmpty,
          "bm25_filtered_topk: store pre-filter and online docFilter serve disagree")
        out
      },
      Some(s"""WITH qs AS (SELECT * FROM (VALUES (0, 'spark hash join'),
              |    (1, 'stream window agg'), (2, 'fast vector scan'),
              |    (3, 'customer query filter')) v(query_id, qtext)),
              |qterms AS (SELECT query_id::BIGINT AS query_id,
              |    unnest(list_distinct(string_split(qtext, ' '))) AS term FROM qs),
              |toks AS (SELECT doc_id, unnest($dkTokens) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
              |dfc AS (SELECT term, count(*) AS df_cnt FROM tf GROUP BY 1),
              |dlen AS (SELECT doc_id, len($dkTokens)::BIGINT AS dl FROM documents),
              |st AS (SELECT count(*) AS n, sum(dl)::BIGINT AS tot FROM dlen),
              |contrib AS (SELECT query_id, t.doc_id,
              |    round((round((ln(1.0::DOUBLE + (n::DOUBLE - df_cnt::DOUBLE + 0.5::DOUBLE)
              |        / (df_cnt::DOUBLE + 0.5::DOUBLE)))::DECIMAL(18,12), 6)::DOUBLE
              |      * ((tf::DOUBLE * 2.2::DOUBLE) / (tf::DOUBLE + 1.2::DOUBLE
              |        * (0.25::DOUBLE + 0.75::DOUBLE * (dl::DOUBLE / (tot::DOUBLE / n::DOUBLE))))))::DECIMAL(18,12),
              |      8)::DECIMAL(18,8) AS c8
              |  FROM tf t JOIN qterms USING (term) JOIN dfc USING (term)
              |    JOIN dlen ON dlen.doc_id = t.doc_id CROSS JOIN st),
              |scored AS (SELECT query_id, doc_id, sum(c8) AS sd, count(*) AS n_terms
              |  FROM contrib GROUP BY 1, 2)
              |SELECT * FROM (
              |  SELECT 'lang_en' AS sel, query_id, s.doc_id, n_terms,
              |    round(sd::DOUBLE, 6) AS score,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY sd DESC, s.doc_id) AS INT) AS rnk
              |  FROM scored s JOIN documents dd ON dd.doc_id = s.doc_id
              |    AND dd.lang = 'en') WHERE rnk <= 5
              |UNION ALL
              |SELECT * FROM (
              |  SELECT 'src7' AS sel, query_id, s.doc_id, n_terms,
              |    round(sd::DOUBLE, 6) AS score,
              |    CAST(row_number() OVER (PARTITION BY query_id
              |      ORDER BY sd DESC, s.doc_id) AS INT) AS rnk
              |  FROM scored s JOIN documents dd ON dd.doc_id = s.doc_id
              |    AND dd.source = 'src7') WHERE rnk <= 5""".stripMargin)),

    // ── The SERVING index itself as a driver-visible row: every
    //    posting's precomputed BM25 contribution as a lossless
    //    1e-8-scaled BIGINT — what Lexical.bm25Serve joins online.
    //    Pinning the full index (not just a top-k) per round means any
    //    drift in the scoring path surfaces as a hash mismatch on the
    //    complete posting mass. ──
    QueryDef(
      "txt_bm25_impact",
      "precomputed BM25 impact index: (term, doc_id, c8s) over all postings",
      (s, d) => {
        val docs = t(s, d, "documents")
        val post = graft.operators.Lexical.postings(docs)
        val dl = graft.operators.Lexical.doclens(docs)
        graft.operators.Lexical.impactIndex(post, dl,
          graft.operators.Lexical.termstats(post),
          graft.operators.Lexical.corpusStats(dl))
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest($dkTokens) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
              |dfc AS (SELECT term, count(*) AS df_cnt FROM tf GROUP BY 1),
              |dlen AS (SELECT doc_id, len($dkTokens)::BIGINT AS dl FROM documents),
              |st AS (SELECT count(*) AS n, sum(dl)::BIGINT AS tot FROM dlen)
              |SELECT term, t.doc_id,
              |  (round((round((ln(1.0::DOUBLE + (n::DOUBLE - df_cnt::DOUBLE + 0.5::DOUBLE)
              |      / (df_cnt::DOUBLE + 0.5::DOUBLE)))::DECIMAL(18,12), 6)::DOUBLE
              |    * ((tf::DOUBLE * 2.2::DOUBLE) / (tf::DOUBLE + 1.2::DOUBLE
              |      * (0.25::DOUBLE + 0.75::DOUBLE * (dl::DOUBLE / (tot::DOUBLE / n::DOUBLE))))))::DECIMAL(18,12),
              |    8)::DECIMAL(18,8) * 100000000)::BIGINT AS c8s
              |FROM tf t JOIN dfc USING (term)
              |  JOIN dlen ON dlen.doc_id = t.doc_id CROSS JOIN st""".stripMargin),
      bench = true),

    // ── Normalization-aware exact dedup: fingerprint AFTER lowercasing
    //    and whitespace collapse, so documents differing only in case or
    //    formatting collapse — the standard normalize-then-hash stage
    //    between raw-byte exact dedup and near-dup MinHash ──
    QueryDef(
      "dedup_exact_normalized",
      "exact duplicate groups on the case/whitespace-normalized fingerprint",
      (s, d) =>
        t(s, d, "documents")
          .groupBy(md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("fp"))
          .agg(min("doc_id").as("keep_doc"), count(lit(1)).as("n")),
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
             |min(doc_id) AS keep_doc, count(*) AS n
             |FROM documents GROUP BY 1""".stripMargin)),

    // ── Character-diversity quality score: Gini impurity 1 − Σ(pᵢ²)
    //    over the per-document character distribution — the rational
    //    cousin of entropy, chosen deliberately: Σ p·log p would hinge
    //    on ln()'s last ulp (libm-dependent, not exactly specified).
    //    The score is published at 1e-6 precision as a BIGINT computed
    //    entirely in integer arithmetic — gini_e6 = ((n²−s2)·10⁶ +
    //    n² div 2) div n², HALF_UP by construction — so no double→
    //    decimal cast semantics (which differ across DuckDB builds) can
    //    ever diverge. Low values flag degenerate (repeated-character)
    //    documents. ──
    QueryDef(
      "txt_gini_diversity",
      "per-document character Gini impurity at 1e-6 (pure integer arithmetic)",
      (s, d) =>
        Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "")
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(sum("cnt").as("n_chars_g"),
            sum(col("cnt") * col("cnt")).as("__s2"))
          .select(col("doc_id"), col("n_chars_g"),
            expr("""((n_chars_g * n_chars_g - __s2) * 1000000L
                    | + (n_chars_g * n_chars_g) div 2)
                    | div (n_chars_g * n_chars_g)""".stripMargin.replace("\n", ""))
              .as("gini_e6")),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
             |cnts AS (SELECT doc_id, ch, count(*) AS cnt FROM ch
             |  WHERE ch <> '' GROUP BY 1, 2),
             |agg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_chars_g,
             |  sum(cnt * cnt)::BIGINT AS s2 FROM cnts GROUP BY doc_id)
             |SELECT doc_id, n_chars_g,
             |  ((n_chars_g * n_chars_g - s2) * 1000000
             |   + (n_chars_g * n_chars_g) // 2)
             |  // (n_chars_g * n_chars_g) AS gini_e6
             |FROM agg""".stripMargin)),

    // ── Array-ops battery: slice / contains / position / distinct over
    //    the staged token array (position: Spark returns 0 for absent,
    //    DuckDB NULL — coalesced to the Spark convention) ──
    QueryDef(
      "txt_array_ops",
      "token-array battery: head slice, membership, position, distinct size",
      (s, d) =>
        Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"),
            expr("concat_ws(' ', slice(__toks, 1, 5))").as("head5"),
            expr("array_contains(__toks, 'the')").as("has_the"),
            expr("array_position(__toks, 'the')").as("pos_the"),
            expr("size(array_distinct(slice(__toks, 1, 20)))").as("n_distinct20")),
      Some(s"""SELECT doc_id,
              |array_to_string(tk[1:5], ' ') AS head5,
              |list_contains(tk, 'the') AS has_the,
              |coalesce(list_position(tk, 'the'), 0)::BIGINT AS pos_the,
              |len(list_distinct(tk[1:20])) AS n_distinct20
              |FROM (SELECT doc_id, $dkTokens AS tk FROM documents)""".stripMargin)),

    // ── Edit distance: Levenshtein over adjacent-doc head windows —
    //    the char-level similarity primitive (identical DP definition
    //    in both engines; windowed to 50 chars so the O(len²) DP stays
    //    bounded per pair — the production guard for edit distance on
    //    long documents) ──
    QueryDef(
      "txt_levenshtein",
      "Levenshtein distance between adjacent documents' first 50 chars",
      (s, d) => {
        val h = t(s, d, "documents")
          .select(col("doc_id"), expr("substring(text, 1, 50)").as("head"))
        h.select(col("doc_id").as("doc_a"), col("head").as("head_a"))
          .join(h.select((col("doc_id") - 1).as("doc_a"), col("head").as("head_b")),
            Seq("doc_a"))
          .select(col("doc_a"), (col("doc_a") + 1).as("doc_b"),
            levenshtein(col("head_a"), col("head_b")).as("edit_dist"))
      },
      Some("""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |levenshtein(substring(a.text, 1, 50), substring(b.text, 1, 50)) AS edit_dist
             |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""".stripMargin)),

    // ── Corpus-level n-gram statistics: global top-20 token trigrams —
    //    the vocabulary/boilerplate profiling pass of a training-data
    //    pipeline. Explode is per-row (no state), the count is one
    //    map-side-combined groupBy, the top-k a TakeOrdered — flat
    //    scale shape with no self-joins. ──
    QueryDef(
      "txt_top_ngrams",
      "global top-20 token trigrams by corpus frequency",
      (s, d) =>
        Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .filter(size(col("__toks")) >= 3)
          .select(explode(expr(
            "transform(sequence(0, size(__toks) - 3), i -> " +
              "concat_ws(' ', __toks[i], __toks[i+1], __toks[i+2]))")).as("ngram"))
          .groupBy("ngram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("ngram"))
          .limit(20),
      Some(s"""WITH toks AS (SELECT $dkTokens AS tk FROM documents),
              |idx AS (SELECT tk, unnest(range(1, len(tk) - 1)) AS i
              |  FROM toks WHERE len(tk) >= 3),
              |ng AS (SELECT tk[i::INT] || ' ' || tk[i::INT + 1] || ' ' || tk[i::INT + 2] AS ngram
              |  FROM idx)
              |SELECT ngram, count(*) AS n FROM ng
              |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin),
      bench = true),

    // ── Priority-aware cluster dedup: when a duplicate cluster spans
    //    sources, keep the representative from the PREFERRED source
    //    (curated > web, here: lowest source ordinal), not the lowest
    //    id — the production policy when corpus tiers differ in
    //    quality. Arg-min via lexicographic MIN over a (priority, id)
    //    struct: one aggregate, deterministic, no window needed. ──
    QueryDef(
      "dedup_apply_priority",
      "duplicate-cluster representatives chosen by source priority, then id",
      (s, d) => {
        val comp = graft.operators.Components
          .connectedComponents(neardupPairs(s, d), "id_a", "id_b", edgesDistinct = true)
          .select(col("id").as("doc_id"), col("component"))
        val prio = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            regexp_extract(col("source"), "([0-9]+)$", 1).cast("long").as("prio"))
        comp.join(prio, Seq("doc_id"))
          .groupBy("component")
          .agg(count(lit(1)).as("n_members"),
            min(struct(col("prio"), col("doc_id"))).as("best"))
          .select(col("component"), col("n_members"),
            col("best.doc_id").as("keep_doc"), col("best.prio").as("keep_prio"))
      },
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |prs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM prs
              |  UNION SELECT id_b, id_a FROM prs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e2.src AS id, reach.r FROM uedges e2 JOIN reach ON reach.id = e2.dst),
              |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
              |ranked AS (SELECT c.component, c.doc_id,
              |    regexp_extract(d.source, '([0-9]+)$$', 1)::BIGINT AS prio,
              |    row_number() OVER (PARTITION BY c.component
              |      ORDER BY regexp_extract(d.source, '([0-9]+)$$', 1)::BIGINT, c.doc_id) AS rn,
              |    count(*) OVER (PARTITION BY c.component) AS n_members
              |  FROM comp c JOIN documents d USING (doc_id))
              |SELECT component, n_members, doc_id AS keep_doc, prio AS keep_prio
              |FROM ranked WHERE rn = 1""".stripMargin)),

    // ── Document chunking (Generator/UDTF surface, SURVEY §2-I) ──
    //    64-token windows, 16-token overlap (stride 48): the standard
    //    pre-embedding segmentation; plans as a Generate over the scan.
    QueryDef(
      "txt_chunks",
      "overlapping token-window chunking via the ChunkTokens Generator",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_chunk_tokens(text, 64, 16)").as(Seq("chunk_idx", "chunk")))
      },
      Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
             |  FROM documents WHERE length(trim(text)) > 0),
             |ch AS (SELECT doc_id, tk, unnest(range(0, (len(tk) + 47) // 48)) AS i FROM toks)
             |SELECT doc_id, i::INT AS chunk_idx,
             |  array_to_string(tk[(i*48 + 1)::INT : (i*48 + 64)::INT], ' ') AS chunk
             |FROM ch""".stripMargin)),

    // ── Chunk-level exact dedup: the chunking Generator feeding the
    //    dedup path (boilerplate chunks collapse across documents) ──
    QueryDef(
      "dedup_chunks",
      "exact duplicate chunk groups across documents (Generator → hash-groupBy)",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_chunk_tokens(text, 64, 16)").as(Seq("chunk_idx", "chunk")))
          .groupBy(md5(col("chunk")).as("fp"))
          .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n"))
      },
      Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
             |  FROM documents WHERE length(trim(text)) > 0),
             |ch AS (SELECT doc_id, tk, unnest(range(0, (len(tk) + 47) // 48)) AS i FROM toks),
             |chunks AS (SELECT doc_id,
             |  array_to_string(tk[(i*48 + 1)::INT : (i*48 + 64)::INT], ' ') AS chunk FROM ch)
             |SELECT md5(chunk) AS fp, min(doc_id) AS keep_doc, count(*) AS n
             |FROM chunks GROUP BY md5(chunk)""".stripMargin)),

    // ── Chunk-level NEAR-dup: the chunking Generator's output fed
    //    through the complete MinHash-LSH pipeline (shingle-hash →
    //    signature → capped bands → bucket join → Jaccard rescore) with
    //    a synthetic chunk id — paraphrased/partially-edited boilerplate
    //    across documents, where the exact-fp overlap query only sees
    //    verbatim copies. Demonstrates the dedup stack composes over
    //    any derived corpus. ──
    QueryDef(
      "dedup_chunk_neardup",
      "cross-document near-duplicate chunk pairs (Generator -> MinHash-LSH -> Jaccard >= 0.8)",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val chunks = Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_chunk_tokens(text, 64, 16)").as(Seq("chunk_idx", "chunk")))
          .withColumn("chunk_id",
            col("doc_id") * lit(10000L) + col("chunk_idx"))
        val hashed = Dedup.withShingleHashes(chunks, "chunk")
          .select(col("chunk_id"), col("doc_id"),
            array_distinct(col("shingle_hashes")).as("hs"), col("shingle_hashes"))
        val cands = Dedup.lshCandidatePairs(
          Dedup.minhashBandsFromHashes(hashed, "chunk_id"), "chunk_id")
        cands
          .join(hashed.select(col("chunk_id").as("id_a"), col("hs").as("sh_a"),
            col("doc_id").as("doc_a")), Seq("id_a"))
          .join(hashed.select(col("chunk_id").as("id_b"), col("hs").as("sh_b"),
            col("doc_id").as("doc_b")), Seq("id_b"))
          .filter(col("doc_a") =!= col("doc_b"))
          .select(col("id_a"), col("id_b"), col("doc_a"), col("doc_b"),
            Dedup.jaccardCol.as("jaccard"))
          .filter(col("jaccard") >= 0.8)
      },
      Some {
        val cleanChunk = "lower(regexp_replace(chunk, '[^ -~]', '', 'g'))"
        s"""WITH dtoks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
           |  FROM documents WHERE length(trim(text)) > 0),
           |cidx AS (SELECT doc_id, tk, unnest(range(0, (len(tk) + 47) // 48)) AS i FROM dtoks),
           |chunks AS (SELECT doc_id, i,
           |  array_to_string(tk[(i*48 + 1)::INT : (i*48 + 64)::INT], ' ') AS chunk FROM cidx),
           |hh AS (SELECT doc_id * 10000 + i AS chunk_id, doc_id,
           |  list_distinct(list_transform(${dkTokShingles(cleanChunk)}, sh -> ${dkPoly("sh")})) AS h
           |  FROM chunks),
           |sig AS (SELECT chunk_id, doc_id,
           |  list_transform(range(0, ${Dedup.NumHashes}), i ->
           |    list_min(list_transform(h, x -> ((2*i + 3) * x + (7919*i + 13)) % ${Dedup.MinhashP}))) AS sg
           |  FROM hh WHERE len(h) > 0),
           |bands AS (SELECT chunk_id, band,
           |  list_reduce(list_prepend(0::BIGINT,
           |    sg[band*${Dedup.RowsPerBand} + 1 : band*${Dedup.RowsPerBand} + ${Dedup.RowsPerBand}]),
           |    (a, x) -> (a * 31 + x) % ${Dedup.BandP}) AS band_hash
           |  FROM sig, range(0, ${Dedup.Bands}) tt(band)
           |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${Dedup.MaxBucket}),
           |cands AS (SELECT DISTINCT a.chunk_id AS id_a, b.chunk_id AS id_b
           |  FROM bands a JOIN bands b
           |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.chunk_id < b.chunk_id)
           |SELECT * FROM (
           |  SELECT id_a, id_b, x.doc_id AS doc_a, y.doc_id AS doc_b,
           |    round((len(list_intersect(x.h, y.h))::DOUBLE /
           |      (len(x.h) + len(y.h) - len(list_intersect(x.h, y.h))))::DECIMAL(18,12), 6)::DOUBLE AS jaccard
           |  FROM cands JOIN hh x ON x.chunk_id = id_a JOIN hh y ON y.chunk_id = id_b
           |  WHERE x.doc_id <> y.doc_id)
           |WHERE jaccard >= 0.8""".stripMargin
      }),

    // ── Cross-document chunk overlap (contamination detection): doc
    //    pairs sharing at least one identical chunk, via a hash-bucketed
    //    self-join on md5(chunk) — the eval-contamination / boilerplate-
    //    overlap check of a training pipeline. Hot chunk hashes (e.g.
    //    ubiquitous boilerplate) are capped like every bucket join. ──
    QueryDef(
      "dedup_chunk_overlap",
      "document pairs sharing an identical chunk, with shared-chunk counts",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val chunks = Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_chunk_tokens(text, 64, 16)").as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), md5(col("chunk")).as("fp"))
          .distinct()
        val capped = Dedup.dropHotBuckets(chunks, Seq("fp"),
          Dedup.MaxBucket, "dedup_chunk_overlap")
        capped.select(col("doc_id").as("id_a"), col("fp"))
          .join(capped.select(col("doc_id").as("id_b"), col("fp")), Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("n_shared_chunks"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
              |  FROM documents WHERE length(trim(text)) > 0),
              |ch AS (SELECT doc_id, tk, unnest(range(0, (len(tk) + 47) // 48)) AS i FROM toks),
              |chunks AS (SELECT DISTINCT doc_id,
              |  md5(array_to_string(tk[(i*48 + 1)::INT : (i*48 + 64)::INT], ' ')) AS fp FROM ch
              |  ),
              |capped AS (SELECT * FROM chunks
              |  QUALIFY count(*) OVER (PARTITION BY fp) <= ${Dedup.MaxBucket})
              |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_chunks
              |FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
              |GROUP BY a.doc_id, b.doc_id""".stripMargin)),

    // ── PII redaction: the corpus carries no PII, so deterministic
    //    synthetic PII (derived from doc_id) is injected IN the query on
    //    both sides, then scrubbed — proving the regexes actually match
    //    and the redaction rewrites, not just that a no-op passed. The
    //    patterns avoid lookarounds so Java regex (Spark) and RE2
    //    (DuckDB) agree. ──
    QueryDef(
      "txt_pii_redact",
      "email/phone redaction counts + redacted-text digest (synthetic PII injected)",
      (s, d) => {
        val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
        val phoneRe = """\b555-[0-9]{4}\b"""
        t(s, d, "documents")
          .withColumn("__pii", concat(
            col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("__pii"), lit(emailRe), lit(0))).as("n_emails"),
            size(regexp_extract_all(col("__pii"), lit(phoneRe), lit(0))).as("n_phones"),
            md5(regexp_replace(regexp_replace(col("__pii"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>")).as("red_md5"))
      },
      Some("""WITH pii AS (SELECT doc_id,
             |  text || ' contact user' || doc_id || '@mail.example.com or call 555-' ||
             |    lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS n_phones,
             |  md5(regexp_replace(regexp_replace(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS red_md5
             |FROM pii""".stripMargin)),

    // ── Per-domain document caps: bound any one source's contribution
    //    to the corpus (window rank per source, keep the N earliest). ──
    QueryDef(
      "cap_per_source",
      "per-source document cap (10 earliest docs per source)",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("source").orderBy("doc_id")))
          .filter(col("rn") <= 10)
          .select("doc_id", "source", "rn"),
      Some("""SELECT doc_id, source,
             |row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
             |FROM documents QUALIFY rn <= 10""".stripMargin)),

    // ── Eval-set decontamination: docs whose id ≡ 0 (mod 50) stand in
    //    for a held-out benchmark; any training doc sharing an identical
    //    64-token chunk fingerprint with an eval doc is removed. The
    //    chunk-fp join is the bucketed shape of dedup_chunk_overlap. ──
    QueryDef(
      "decontam_keep",
      "training docs kept after removing eval-chunk-sharing documents",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val chunks = Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_chunk_tokens(text, 64, 16)").as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), md5(col("chunk")).as("fp"))
        val evalFps = chunks.filter(col("doc_id") % 50 === 0).select("fp").distinct()
        val contaminated = chunks.filter(col("doc_id") % 50 =!= 0)
          .join(evalFps, Seq("fp")).select("doc_id").distinct()
        t(s, d, "documents").select("doc_id")
          .filter(col("doc_id") % 50 =!= 0)
          .join(contaminated, Seq("doc_id"), "left_anti")
      },
      Some("""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
             |  FROM documents WHERE length(trim(text)) > 0),
             |ch AS (SELECT doc_id, tk, unnest(range(0, (len(tk) + 47) // 48)) AS i FROM toks),
             |chunks AS (SELECT doc_id,
             |  md5(array_to_string(tk[(i*48 + 1)::INT : (i*48 + 64)::INT], ' ')) AS fp FROM ch)
             |SELECT doc_id FROM documents WHERE doc_id % 50 <> 0 AND doc_id NOT IN (
             |  SELECT DISTINCT c.doc_id FROM chunks c
             |  JOIN (SELECT DISTINCT fp FROM chunks WHERE doc_id % 50 = 0) e USING (fp)
             |  WHERE c.doc_id % 50 <> 0)""".stripMargin)),

    // ── Intra-document repetition (Gopher-style quality signal):
    //    1 - distinct/total over token 3-shingles. ──
    QueryDef(
      "txt_repetition",
      "token-3-shingle repetition ratio per document",
      (s, d) => Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
        .select(col("doc_id"),
          expr("greatest(size(__toks) - 2, 0)").as("n_shingles"),
          expr(s"CAST(round(CAST(IF(size(__toks) > 2, 1.0 - size(${TextFunctions.tokenShinglesSql("__toks", 3)}) " +
            "/ CAST(size(__toks) - 2 AS DOUBLE), 0.0D) AS DECIMAL(18,12)), 6) AS DOUBLE)").as("rep_ratio")),
      Some(s"""SELECT doc_id, greatest(len($dkTokens) - 2, 0) AS n_shingles,
              |round((CASE WHEN len($dkTokens) > 2
              |  THEN 1.0 - len(${dkTokShingles("text")})
              |    / (len($dkTokens) - 2)::DOUBLE ELSE 0.0 END)::DECIMAL(18,12), 6)::DOUBLE AS rep_ratio
              |FROM documents""".stripMargin)),

    // ── Sequence packing (offset policy): docs → fixed token-budget
    //    training sequences. Distributed two-phase prefix sum under the
    //    hood (range partition → per-partition window cumsum → broadcast
    //    offset join; only per-partition totals touch the driver), so
    //    the global running offset is exact and the oracle replays it
    //    with a plain window sum. ──
    QueryDef(
      "pack_sequences",
      "token-budget sequence assignment from the global token offset (budget 512)",
      (s, d) => {
        val toks = Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"),
            TextFunctions.tokenCount("__toks").cast("long").as("n_tokens"))
        graft.operators.Packing.packByOffset(s, toks, "doc_id", "n_tokens", 512L)
      },
      Some(s"""SELECT doc_id, n_tokens, (cs - n_tokens) // 512 AS seq_id FROM (
              |  SELECT doc_id, n_tokens,
              |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
              |  FROM (SELECT doc_id, len($dkTokens)::BIGINT AS n_tokens FROM documents))""".stripMargin),
      bench = true),

    // ── Packing efficiency report over the same assignment ──
    QueryDef(
      "pack_stats",
      "per-sequence document count and token fill for the offset packing",
      (s, d) => {
        val toks = Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"),
            TextFunctions.tokenCount("__toks").cast("long").as("n_tokens"))
        graft.operators.Packing.packByOffset(s, toks, "doc_id", "n_tokens", 512L)
          .groupBy("seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
      },
      Some(s"""WITH packed AS (
              |  SELECT doc_id, n_tokens, (cs - n_tokens) // 512 AS seq_id FROM (
              |    SELECT doc_id, n_tokens,
              |      CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
              |    FROM (SELECT doc_id, len($dkTokens)::BIGINT AS n_tokens FROM documents)))
              |SELECT seq_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
              |FROM packed GROUP BY seq_id""".stripMargin)),

    // ── Learned-stats scoring: corpus-wide token frequencies (the
    //    "trained" statistic) broadcast back onto each document — docs
    //    full of rare tokens score low (noise/garbage signal). All
    //    integer sums + one exact division, so the oracle is exact. ──
    QueryDef(
      "txt_commonness",
      "mean corpus-frequency of each document's tokens (two-pass learned stats)",
      (s, d) => {
        val tk = Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"), explode(col("__toks")).as("tok"))
        val freq = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
        tk.join(broadcast(freq), Seq("tok"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(avg("cnt").cast("decimal(18,12)"), 4).cast("double").as("mean_tok_freq"))
      },
      Some("""WITH tk AS (SELECT doc_id,
             |  unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
             |freq AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok)
             |SELECT doc_id, count(*) AS n_tokens, round(avg(cnt)::DECIMAL(18,12), 4)::DOUBLE AS mean_tok_freq
             |FROM tk JOIN freq USING (tok) GROUP BY doc_id""".stripMargin)),

    // ── Incremental dedup ingest: a NEW batch of documents (ids ≥ 450)
    //    checked against the EXISTING corpus index (ids < 450) plus
    //    within itself — the production shape where yesterday's band
    //    index is stored and today's batch joins against it instead of
    //    re-deduping the world. Per-side hot-bucket caps. ──
    QueryDef(
      "dedup_incremental",
      "LSH candidates of a new doc batch vs the stored index and within itself",
      (s, d) => {
        val docs = t(s, d, "documents")
        val oldC = Dedup.dropHotBuckets(
          Dedup.minhashBands(docs.filter(col("doc_id") < 450), "text", "doc_id"),
          Seq("band", "band_hash"), Dedup.MaxBucket, "incr_old")
        val newC = Dedup.dropHotBuckets(
          Dedup.minhashBands(docs.filter(col("doc_id") >= 450), "text", "doc_id"),
          Seq("band", "band_hash"), Dedup.MaxBucket, "incr_new")
        val cross = newC.select(col("doc_id").as("id_a"), col("band"), col("band_hash"))
          .join(oldC.select(col("doc_id").as("id_b"), col("band"), col("band_hash")),
            Seq("band", "band_hash"))
          .select(col("id_a"), col("id_b")).distinct()
          .withColumn("vs", lit("old"))
        val within = Dedup.lshCandidatePairs(newC, "doc_id")
          .withColumn("vs", lit("new"))
        cross.unionByName(within)
      },
      Some(s"""WITH hh AS (SELECT doc_id,
              |  list_transform(${dkTokShingles(dkClean)}, sh -> ${dkPoly("sh")}) AS h
              |  FROM documents),
              |sig AS (SELECT doc_id,
              |  list_transform(range(0, ${Dedup.NumHashes}), i ->
              |    list_min(list_transform(h, x -> ((2*i + 3) * x + (7919*i + 13)) % ${Dedup.MinhashP}))) AS sg
              |  FROM hh WHERE len(h) > 0),
              |bands AS (SELECT doc_id, band,
              |  list_reduce(list_prepend(0::BIGINT,
              |    sg[band*${Dedup.RowsPerBand} + 1 : band*${Dedup.RowsPerBand} + ${Dedup.RowsPerBand}]),
              |    (a, x) -> (a * 31 + x) % ${Dedup.BandP}) AS band_hash
              |  FROM sig, range(0, ${Dedup.Bands}) tt(band)),
              |oldc AS (SELECT * FROM bands WHERE doc_id < 450
              |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${Dedup.MaxBucket}),
              |newc AS (SELECT * FROM bands WHERE doc_id >= 450
              |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${Dedup.MaxBucket}),
              |crossp AS (SELECT DISTINCT n.doc_id AS id_a, o.doc_id AS id_b
              |  FROM newc n JOIN oldc o USING (band, band_hash)),
              |within AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM newc a JOIN newc b
              |  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
              |SELECT id_a, id_b, 'old' AS vs FROM crossp
              |UNION ALL SELECT id_a, id_b, 'new' AS vs FROM within""".stripMargin)),

    // ── Training-mix stratified sampling: per-language keep rates
    //    (upsample scarce, downsample dominant) decided by a
    //    deterministic hash draw — the distributed, reproducible form
    //    of `sampleBy`, exactly replayable in SQL. ──
    QueryDef(
      "mix_sample_by_lang",
      "deterministic per-language stratified sample (training mix weights)",
      (s, d) => {
        // permille keep-rates per language
        val rates = Map("en" -> 500, "de" -> 800, "fr" -> 800, "es" -> 800, "zh" -> 1000)
        val rateCol = rates.foldLeft(lit(0)) { case (acc, (l, r)) =>
          when(col("lang") === l, lit(r)).otherwise(acc)
        }
        t(s, d, "documents")
          .withColumn("__draw", (col("doc_id") * 2654435761L + 40503L) % 1000L)
          .filter(col("__draw") < rateCol)
          .select("doc_id", "lang")
      },
      Some("""SELECT doc_id, lang FROM documents
             |WHERE (doc_id * 2654435761 + 40503) % 1000 <
             |  CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 800 WHEN 'fr' THEN 800
             |            WHEN 'es' THEN 800 WHEN 'zh' THEN 1000 ELSE 0 END""".stripMargin)),

    // ── Temperature-smoothed mixture weights (the multilingual-LM
    //    sampling standard, Conneau & Lample: p_l ∝ share_l^α): the
    //    ratios mix_sample_by_lang hardcodes, COMPUTED from the corpus.
    //    α = 1/4 is dyadic on purpose — share^α = sqrt(sqrt(share)) is
    //    two IEEE-exact operations, identical in any engine, where a
    //    pow(x, 0.3) could differ in the last ulp between libm
    //    implementations. The smoothed masses quantize to DECIMAL
    //    before normalization so the denominator is an order-free exact
    //    decimal sum, not a float reduction. Two K-row aggregates +
    //    1-row broadcasts (decorrelated scalars) at any corpus size. ──
    QueryDef(
      "mix_temperature_weights",
      "per-language temperature-smoothed sampling weights (alpha = 1/4)",
      (s, d) => {
        // K-row checkpoint: the scalar-total and normalization branches
        // below would each re-derive this aggregate (4 corpus scans in
        // the static plan — Catalyst does not dedupe identical
        // DataFrame subtrees); cutting here makes every branch read the
        // K cached rows, so the corpus is tokenized exactly ONCE.
        val per = t(s, d, "documents")
          .withColumn("__toks", expr(TextFunctions.tokensSql("text")))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextFunctions.tokenCount("__toks").cast("long")).as("n_tokens"))
          .localCheckpoint(true)
        val tot = per.agg(sum("n_tokens").as("__tot"))
        val sh = per.crossJoin(broadcast(tot))
          .withColumn("share", col("n_tokens").cast("double") / col("__tot").cast("double"))
          .withColumn("q", expr("CAST(sqrt(sqrt(share)) AS DECIMAL(20,16))"))
        val qtot = sh.agg(sum("q").as("__qtot"))
        sh.crossJoin(broadcast(qtot))
          .withColumn("weight",
            round(col("q").cast("double") / col("__qtot").cast("double"), 8))
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            round(col("share"), 8).as("share"), col("weight"),
            round(col("weight") / col("share"), 6).as("epochs"))
      },
      Some(s"""WITH per AS (SELECT lang, count(*) AS n_docs,
              |    sum(len($dkTokens))::BIGINT AS n_tokens
              |  FROM documents GROUP BY 1),
              |tot AS (SELECT sum(n_tokens)::BIGINT AS t FROM per),
              |sh AS (SELECT lang, n_docs, n_tokens,
              |    n_tokens::DOUBLE / t::DOUBLE AS share,
              |    (sqrt(sqrt(n_tokens::DOUBLE / t::DOUBLE)))::DECIMAL(20,16) AS q
              |  FROM per, tot),
              |qt AS (SELECT sum(q) AS qtot FROM sh)
              |SELECT lang, n_docs, n_tokens, round(share, 8) AS share,
              |  round(q::DOUBLE / qtot::DOUBLE, 8) AS weight,
              |  round(round(q::DOUBLE / qtot::DOUBLE, 8) / share, 6) AS epochs
              |FROM sh, qt""".stripMargin)),

    // ── Token-budget execution plan: the mixture weights turned into
    //    the concrete recipe a data loader executes. For a 1e9-token
    //    budget, language l owes target_l = weight_ppm_l · 1000 tokens;
    //    against avail_l tokens on hand that is `full_epochs` complete
    //    passes plus a remainder pass at `rem_rate_ppm` (round-half-up
    //    ppm of the leftover fraction — upsampling scarce languages is
    //    exactly full_epochs ≥ 1). Arithmetic is BIGINT end-to-end with
    //    ONE DECIMAL(38,0)/HUGEINT widening at the remainder cross-
    //    multiply, where 2e6·r would overflow signed 64-bit once a
    //    source holds > ~4.6e12 tokens — the chi2 discipline. Weights
    //    re-derive exactly as mix_temperature_weights (dyadic α, decimal
    //    mass sums), so the two rows can never disagree. K-row frame. ──
    QueryDef(
      "mix_epoch_plan",
      "per-language loader plan for a 1e9-token budget: full epochs + remainder ppm rate",
      (s, d) => {
        // K-row checkpoint — one corpus tokenize for all scalar
        // branches (see mix_temperature_weights)
        val per = t(s, d, "documents")
          .withColumn("__toks", expr(TextFunctions.tokensSql("text")))
          .groupBy("lang")
          .agg(sum(TextFunctions.tokenCount("__toks").cast("long")).as("n_tokens"))
          .localCheckpoint(true)
        val tot = per.agg(sum("n_tokens").as("__tot"))
        val sh = per.crossJoin(broadcast(tot))
          .withColumn("share", col("n_tokens").cast("double") / col("__tot").cast("double"))
          .withColumn("q", expr("CAST(sqrt(sqrt(share)) AS DECIMAL(20,16))"))
        val qtot = sh.agg(sum("q").as("__qtot"))
        sh.crossJoin(broadcast(qtot))
          .withColumn("weight_ppm", expr(
            "CAST(round(round(CAST(q AS DOUBLE) / CAST(__qtot AS DOUBLE), 8) * 1000000) AS BIGINT)"))
          .withColumn("target_tokens", col("weight_ppm") * lit(1000L))
          .withColumn("full_epochs", expr("target_tokens div n_tokens"))
          .withColumn("rem_rate_ppm", expr(
            "CAST((2000000 * CAST(target_tokens % n_tokens AS DECIMAL(38,0)) + n_tokens) div (2 * n_tokens) AS BIGINT)"))
          .select("lang", "n_tokens", "weight_ppm", "target_tokens",
            "full_epochs", "rem_rate_ppm")
      },
      Some(s"""WITH per AS (SELECT lang, sum(len($dkTokens))::BIGINT AS n_tokens
              |  FROM documents GROUP BY 1),
              |tot AS (SELECT sum(n_tokens)::BIGINT AS t FROM per),
              |sh AS (SELECT lang, n_tokens,
              |    (sqrt(sqrt(n_tokens::DOUBLE / t::DOUBLE)))::DECIMAL(20,16) AS q
              |  FROM per, tot),
              |qt AS (SELECT sum(q) AS qtot FROM sh),
              |p AS (SELECT lang, n_tokens,
              |    CAST(round(round(q::DOUBLE / qtot::DOUBLE, 8) * 1000000) AS BIGINT) AS weight_ppm
              |  FROM sh, qt)
              |SELECT lang, n_tokens, weight_ppm,
              |  weight_ppm * 1000 AS target_tokens,
              |  (weight_ppm * 1000) // n_tokens AS full_epochs,
              |  ((2000000 * ((weight_ppm * 1000) % n_tokens)::HUGEINT + n_tokens)
              |    // (2 * n_tokens))::BIGINT AS rem_rate_ppm
              |FROM p""".stripMargin)),

    // ── Deterministic global shuffle into training shards: order by a
    //    seeded hash (reproducible epoch-0 data order), shard by hash
    //    mod N. Shard assignment needs no global sort at all — it is a
    //    pure per-row projection; the within-shard position uses the
    //    same distributed prefix machinery as packing when a writer
    //    needs it. ──
    QueryDef(
      "shuffle_shards",
      "seeded deterministic shuffle: shard id + within-shard rank per doc",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("__h", (col("doc_id") * 1103515245L + 12345L) % 2147483647L)
          .withColumn("shard", (col("__h") % 8L).cast("long"))
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("shard").orderBy("__h", "doc_id")).cast("long") - 1L)
          .select(col("doc_id"), col("shard"), col("pos")),
      Some("""SELECT doc_id, shard,
             |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) - 1 AS pos
             |FROM (SELECT doc_id,
             |  (doc_id * 1103515245 + 12345) % 2147483647 AS h,
             |  ((doc_id * 1103515245 + 12345) % 2147483647) % 8 AS shard
             |FROM documents)""".stripMargin)),

    // ── End-to-end corpus curation filter: language allow-list +
    //    quality-signal thresholds (token count, punctuation ratio,
    //    repetition) composed into one kept-corpus predicate — the
    //    filter stage a production pipeline runs before dedup. ──
    QueryDef(
      "corpus_filter",
      "kept docs after language + quality + repetition thresholds",
      (s, d) => Dedup.stageThenSpread(t(s, d, "documents"),
          "__toks" -> expr(TextFunctions.tokensSql("text")))
        .withColumn("n_tokens", TextFunctions.tokenCount("__toks"))
        .withColumn("punct_ratio", TextFunctions.punctRatio("text"))
        .withColumn("rep_ratio",
          expr(s"CAST(round(CAST(IF(size(__toks) > 2, 1.0 - size(${TextFunctions.tokenShinglesSql("__toks", 3)}) " +
            "/ CAST(size(__toks) - 2 AS DOUBLE), 0.0D) AS DECIMAL(18,12)), 6) AS DOUBLE)"))
        .filter(col("lang").isin("en", "de", "fr", "es") &&
          col("n_tokens") >= 50 && col("punct_ratio") <= 0.05 &&
          col("rep_ratio") <= 0.999)
        .select("doc_id", "lang", "n_tokens"),
      Some(s"""SELECT doc_id, lang, len($dkTokens) AS n_tokens FROM documents
              |WHERE lang IN ('en', 'de', 'fr', 'es')
              |  AND len($dkTokens) >= 50
              |  AND round((length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
              |    / greatest(length(text), 1))::DECIMAL(18,12), 6) <= 0.05
              |  AND round((CASE WHEN len($dkTokens) > 2
              |    THEN 1.0 - len(${dkTokShingles("text")})
              |      / (len($dkTokens) - 2)::DOUBLE ELSE 0.0 END)::DECIMAL(18,12), 6) <= 0.999""".stripMargin)),

    // ── PROFILE-DRIFT monitor (the "expectations" / data-quality gate
    //    every standing ingest runs): per-language profiles of a stored
    //    BASELINE corpus vs an arriving batch — counts and char-mass
    //    means — with drift decided by INTEGER CROSS-MULTIPLICATION
    //    (|ch_b·n_a − ch_a·n_b|·5 > ch_a·n_b ⇔ mean moved >20%) with
    //    DECIMAL(38,0)/HUGEINT products (BIGINT would wrap at 100 TB
    //    char masses), so no float ratio or overflow can disagree
    //    between engines, plus new/vanished-
    //    language flags off the full-outer join. At 100 TB both
    //    profiles are metadata-sized aggregates (one map-side-combined
    //    groupBy each); the comparison never touches row data. ──
    QueryDef(
      "profile_drift_lang",
      "baseline-vs-batch per-language profile: counts, >20% exact mean-chars drift, new/vanished flags",
      (s, d) => {
        val docs = t(s, d, "documents")
        def prof(df: DataFrame) = df.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("ch"))
        val base = prof(docs.filter(col("doc_id") % 2 === 0))
          .select(col("lang"), col("n").as("n_base"), col("ch").as("ch_base"))
        val batch = prof(docs.filter(col("doc_id") % 2 === 1))
          .select(col("lang"), col("n").as("n_batch"), col("ch").as("ch_batch"))
        base.join(batch, Seq("lang"), "full")
          .select(col("lang"),
            coalesce(col("n_base"), lit(0L)).as("n_base"),
            coalesce(col("n_batch"), lit(0L)).as("n_batch"),
            col("n_base").isNull.cast("int").as("lang_new"),
            col("n_batch").isNull.cast("int").as("lang_gone"),
            // DECIMAL(38,0) products (HUGEINT in the oracle): at 100 TB
            // ch ~ 1e14 chars times n ~ 1e5 langs-worth of rows exceeds
            // the BIGINT range, and non-ANSI engines would wrap silently
            // where the oracle promotes — exactly the disagreement the
            // integer cross-multiplication exists to rule out
            (coalesce(col("n_base"), lit(0L)) > 0 &&
              coalesce(col("n_batch"), lit(0L)) > 0 &&
              abs(col("ch_batch").cast("decimal(38,0)") * col("n_base") -
                  col("ch_base").cast("decimal(38,0)") * col("n_batch")) * 5 >
                col("ch_base").cast("decimal(38,0)") * col("n_batch"))
              .cast("int").as("mean_drift"))
      },
      Some("""WITH a AS (SELECT lang, count(*) AS n_base, sum(n_chars) AS ch_base
             |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
             |b AS (SELECT lang, count(*) AS n_batch, sum(n_chars) AS ch_batch
             |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1)
             |SELECT coalesce(a.lang, b.lang) AS lang,
             |  coalesce(n_base, 0)::BIGINT AS n_base,
             |  coalesce(n_batch, 0)::BIGINT AS n_batch,
             |  (a.lang IS NULL)::INT AS lang_new,
             |  (b.lang IS NULL)::INT AS lang_gone,
             |  (coalesce(n_base, 0) > 0 AND coalesce(n_batch, 0) > 0 AND
             |   abs(ch_batch::HUGEINT * n_base - ch_base::HUGEINT * n_batch) * 5 >
             |     ch_base::HUGEINT * n_batch)::INT
             |    AS mean_drift
             |FROM a FULL JOIN b ON a.lang = b.lang""".stripMargin)),

    // ── Percentile-based curation: keep the top half of each SOURCE by
    //    token count. The cut is 2·rank ≤ n+1 — pure integer arithmetic
    //    on rank() and a partition count, so no engine pair can disagree
    //    (no ratio, no round, no float). Partitioned window ⇒ scale-safe:
    //    the sort is per-source, never global; at 100 TB the same shape
    //    holds with source as the shuffle key (salting a mega-source
    //    would compose via the existing skew machinery). ──
    QueryDef(
      "corpus_filter_percentile",
      "top-half-per-source curation cut (integer median rank, no float threshold)",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n_tokens").desc, col("doc_id"))
        Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .withColumn("n_tokens", TextFunctions.tokenCount("__toks"))
          .withColumn("__rnk", rank().over(w))
          .withColumn("__n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")))
          .filter(col("__rnk") * 2 <= col("__n") + 1)
          .select("doc_id", "source", "n_tokens")
      },
      Some(s"""SELECT doc_id, source, n_tokens FROM (
              |  SELECT doc_id, source, len($dkTokens) AS n_tokens,
              |    rank() OVER (PARTITION BY source ORDER BY len($dkTokens) DESC, doc_id) AS rnk,
              |    count(*) OVER (PARTITION BY source) AS n
              |  FROM documents)
              |WHERE rnk * 2 <= n + 1""".stripMargin)),

    // ── Deterministic train/val/test split: a seeded integer hash draw
    //    per doc_id → 80/10/10. Reproducible across runs and engines
    //    (pure integer arithmetic), leak-free by construction (a doc's
    //    split never depends on other rows), and a narrow projection —
    //    the canonical dataset-split stage of a training pipeline. ──
    QueryDef(
      "split_train_val_test",
      "seeded deterministic 80/10/10 dataset split per document",
      (s, d) =>
        t(s, d, "documents")
          // reduce mod P=2^31-1 BEFORE multiplying (Kmv.hash discipline):
          // A·doc_id overflows signed 64-bit for ids above ~3.47e9, which
          // at trillion-row scale is every id — ANSI would throw, non-ANSI
          // would silently wrap differently than the oracle's BIGINT.
          .withColumn("__h",
            (((col("doc_id") % 2147483647L + 2147483647L) % 2147483647L)
              * 2654435761L + 97L) % 100L)
          .withColumn("split",
            when(col("__h") < 80, "train")
              .when(col("__h") < 90, "val").otherwise("test"))
          .select("doc_id", "split"),
      Some("""SELECT doc_id,
             |  CASE WHEN (((doc_id % 2147483647 + 2147483647) % 2147483647) * 2654435761 + 97) % 100 < 80 THEN 'train'
             |       WHEN (((doc_id % 2147483647 + 2147483647) % 2147483647) * 2654435761 + 97) % 100 < 90 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents""".stripMargin)),

    // ── Split-leakage audit: near-dup pairs CROSSING split boundaries.
    //    A random doc-level split leaks near-duplicates of training
    //    docs into val/test, silently inflating eval — the standard
    //    fix is splitting by dedup CLUSTER, and this query is the gate
    //    that proves whether you need it: the contamination matrix of
    //    verified near-dup pairs by (split_a, split_b). Composes the
    //    production near-dup pipeline (shared memoized band index) with
    //    the deterministic split — two broadcast-sized hash joins on
    //    the pair list, never a rescan of the corpus. ──
    QueryDef(
      "split_leakage_check",
      "near-dup pairs by split pair (cross-split rows = eval contamination)",
      (s, d) => {
        val splitCol =
          when((((col("doc_id") % 2147483647L + 2147483647L) % 2147483647L)
            * 2654435761L + 97L) % 100L < 80, "train")
            .when((((col("doc_id") % 2147483647L + 2147483647L) % 2147483647L)
              * 2654435761L + 97L) % 100L < 90, "val")
            .otherwise("test")
        val sp = t(s, d, "documents").select(col("doc_id"), splitCol.as("split"))
        neardupPairs(s, d).select("id_a", "id_b")
          .join(sp.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
          .join(sp.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
          .groupBy("split_a", "split_b")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)).as("n_leaked"))
      },
      Some(s"""WITH $dkNeardupCtes,
              |sel AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |sp AS (SELECT doc_id,
              |    CASE WHEN (((doc_id % 2147483647 + 2147483647) % 2147483647) * 2654435761 + 97) % 100 < 80 THEN 'train'
              |         WHEN (((doc_id % 2147483647 + 2147483647) % 2147483647) * 2654435761 + 97) % 100 < 90 THEN 'val'
              |         ELSE 'test' END AS split
              |  FROM documents)
              |SELECT a.split AS split_a, b.split AS split_b, count(*) AS n_pairs,
              |  sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END)::BIGINT AS n_leaked
              |FROM sel JOIN sp a ON a.doc_id = sel.id_a
              |  JOIN sp b ON b.doc_id = sel.id_b
              |GROUP BY 1, 2""".stripMargin)),

    // ── Duplicate-cluster size histogram: how much of the duplicated
    //    mass sits in big clusters — the report that decides whether
    //    near-dup removal is a trim (all size-2 pairs) or a purge (a
    //    few mega-clusters of boilerplate). Two K-row aggregates over
    //    the CC labels; the corpus itself is never re-touched. ──
    QueryDef(
      "dedup_cluster_sizes",
      "duplicate-cluster size histogram: clusters and doc mass per size",
      (s, d) =>
        graft.operators.Components
          .connectedComponents(neardupPairs(s, d), "id_a", "id_b", edgesDistinct = true)
          .groupBy("component").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            (count(lit(1)) * col("cluster_size")).as("n_docs"))
          .select("cluster_size", "n_clusters", "n_docs"),
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst),
              |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |sz AS (SELECT component, count(*)::BIGINT AS cluster_size
              |  FROM comp GROUP BY 1)
              |SELECT cluster_size, count(*)::BIGINT AS n_clusters,
              |  (count(*) * cluster_size)::BIGINT AS n_docs
              |FROM sz GROUP BY 1""".stripMargin)),

    // ── Per-source dedup toll: what the keep-one-per-cluster policy
    //    costs each source — n_dropped and the ppm drop rate. The
    //    sourcing-quality complement of dedup_cross_source_matrix
    //    ("which source is mostly copies of things we already have").
    //    Drop list is cluster-map-sized; one broadcast-able join to
    //    label it with sources, K-row output. ──
    QueryDef(
      "dedup_rate_by_source",
      "per-source docs dropped by cluster dedup (keep min id) with ppm rate",
      (s, d) => {
        val comp = graft.operators.Components
          .connectedComponents(neardupPairs(s, d), "id_a", "id_b", edgesDistinct = true)
        val drop = comp.filter(col("component") < col("id"))
          .select(col("id").as("doc_id"), lit(1L).as("__dropped"))
        t(s, d, "documents").select(col("doc_id"), col("source"))
          .join(drop, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("__dropped"), lit(0L))).as("n_dropped"))
          .select(col("source"), col("n_docs"), col("n_dropped"),
            expr("""CAST((2000000 * CAST(n_dropped AS DECIMAL(38,0)) + n_docs)
                    div (2 * CAST(n_docs AS DECIMAL(38,0))) AS BIGINT)""")
              .as("drop_ppm"))
      },
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst),
              |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |drp AS (SELECT id AS doc_id FROM comp WHERE component < id)
              |SELECT source, count(*)::BIGINT AS n_docs,
              |  count(drp.doc_id)::BIGINT AS n_dropped,
              |  ((2000000 * count(drp.doc_id)::HUGEINT + count(*))
              |    // (2 * count(*)::HUGEINT))::BIGINT AS drop_ppm
              |FROM documents LEFT JOIN drp USING (doc_id)
              |GROUP BY 1""".stripMargin)),

    // ── The corpus DATACARD: the one-frame summary a dataset release
    //    ships with — size, composition, duplication, and benchmark-
    //    contamination scalars as a tall (metric, value) table. One
    //    corpus pass for the size/composition facts (a single
    //    multi-aggregate, stacked tall), plus the shared band index for
    //    the dup/contamination facts; every value is an exact BIGINT
    //    count, so the card is engine-identical by construction. ──
    QueryDef(
      "corpus_datacard",
      "dataset release card: size, composition, duplication, contamination (tall exact counts)",
      (s, d) => {
        val base = Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"),
            sum(when(col("doc_id") % 17 === 0, 1L).otherwise(0L)).as("n_benchmark_docs"),
            sum(TextFunctions.tokenCount("__toks").cast("long")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"))
          .selectExpr("""stack(6,
            'n_docs', n_docs, 'n_sources', n_sources, 'n_langs', n_langs,
            'n_benchmark_docs', n_benchmark_docs, 'n_tokens', n_tokens,
            'n_chars', n_chars) AS (metric, value)""")
        val pairs = neardupPairs(s, d).select("id_a", "id_b").localCheckpoint(true)
        val comp = graft.operators.Components
          .connectedComponents(pairs, "id_a", "id_b", edgesDistinct = true)
          .localCheckpoint(true)
        val dup = pairs.agg(count(lit(1)).as("p"))
          .crossJoin(comp.agg(countDistinct(col("component")).as("c"),
            count(lit(1)).as("m"),
            // coalesce: an ungrouped sum over an EMPTY cluster frame is
            // NULL, and a NULL numeric oracle column is the round-9
            // float-widening hash hazard — a dedup-free corpus must
            // say 0, not NULL
            coalesce(sum(when(col("component") < col("id"), 1L)
              .otherwise(0L)), lit(0L)).as("x")))
          .selectExpr("""stack(4,
            'n_neardup_pairs', p, 'n_dup_clusters', c,
            'n_docs_in_dup_clusters', m, 'n_docs_dropped_keep_one', x)
            AS (metric, value)""")
        val contam = pairs
          .select(col("id_a").as("doc_id"), col("id_b").as("other"))
          .union(pairs.select(col("id_b").as("doc_id"), col("id_a").as("other")))
          .filter(col("doc_id") % 17 =!= 0 && col("other") % 17 === 0)
          .agg(countDistinct(col("doc_id")).as("k"))
          .selectExpr("stack(1, 'n_benchmark_contaminated', k) AS (metric, value)")
        base.unionByName(dup).unionByName(contam)
      },
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst),
              |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |sides AS (SELECT id_a AS doc_id, id_b AS other FROM pairs
              |  UNION ALL SELECT id_b, id_a FROM pairs)
              |SELECT 'n_docs' AS metric, count(*)::BIGINT AS value FROM documents
              |UNION ALL SELECT 'n_sources', count(DISTINCT source)::BIGINT FROM documents
              |UNION ALL SELECT 'n_langs', count(DISTINCT lang)::BIGINT FROM documents
              |UNION ALL SELECT 'n_benchmark_docs',
              |  sum(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END)::BIGINT FROM documents
              |UNION ALL SELECT 'n_tokens', sum(len($dkTokens))::BIGINT FROM documents
              |UNION ALL SELECT 'n_chars', sum(n_chars)::BIGINT FROM documents
              |UNION ALL SELECT 'n_neardup_pairs', count(*)::BIGINT FROM pairs
              |UNION ALL SELECT 'n_dup_clusters', count(DISTINCT component)::BIGINT FROM comp
              |UNION ALL SELECT 'n_docs_in_dup_clusters', count(*)::BIGINT FROM comp
              |UNION ALL SELECT 'n_docs_dropped_keep_one',
              |  coalesce(sum(CASE WHEN component < id THEN 1 ELSE 0 END), 0)::BIGINT FROM comp
              |UNION ALL SELECT 'n_benchmark_contaminated', count(DISTINCT doc_id)::BIGINT
              |  FROM sides WHERE doc_id % 17 <> 0 AND other % 17 = 0""".stripMargin),
      bench = true),

    // ── Vocabulary richness per source: type-token ratio (distinct
    //    terms / total terms, ppm) plus the raw counts — the cheap
    //    "is this source templated boilerplate or real language"
    //    screen (TTR collapses on machine-generated text). One
    //    tokenize pass; per-(source, term) pre-aggregation makes the
    //    distinct count a map-side-combinable second aggregate, never
    //    a count(distinct) shuffle of raw tokens. ──
    QueryDef(
      "txt_ttr_by_source",
      "per-source type-token ratio (ppm) with term/type counts",
      (s, d) =>
        Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("source"), explode(col("__toks")).as("term"))
          .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"))
          .select(col("source"), col("n_types"), col("n_tokens"),
            expr("""CAST((2000000 * CAST(n_types AS DECIMAL(38,0)) + n_tokens)
                    div (2 * CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT)""")
              .as("ttr_ppm")),
      Some(s"""WITH tk AS (SELECT source, unnest($dkTokens) AS term FROM documents),
              |pt AS (SELECT source, term, count(*) AS cnt FROM tk GROUP BY 1, 2)
              |SELECT source, count(*)::BIGINT AS n_types, sum(cnt)::BIGINT AS n_tokens,
              |  ((2000000 * count(*)::HUGEINT + sum(cnt))
              |    // (2 * sum(cnt)::HUGEINT))::BIGINT AS ttr_ppm
              |FROM pt GROUP BY 1""".stripMargin)),

    // ── Heaps'-law vocabulary growth curve in ONE pass: 3-token-
    //    shingle vocabulary size after each 10%-of-corpus checkpoint,
    //    computed not by K rescans but from each shingle's FIRST
    //    document — vocab(c) = #shingles whose min(doc_id) falls in
    //    the first c docs. Sub-linear growth is the healthy-corpus
    //    signature; a straight line says the corpus keeps minting
    //    novel junk (OCR noise, random ids), a hard flatline says
    //    boilerplate. Shingles, not unigrams: the unigram vocabulary
    //    saturates instantly on any corpus with a bounded wordlist,
    //    while the shingle space is what the dedup/decontam machinery
    //    actually keys on. Tokenize once, one (shingle → min doc)
    //    aggregate, one K-bucket count. ──
    QueryDef(
      "corpus_vocab_growth",
      "Heaps-law curve: 3-shingle vocabulary size at each doc-decile checkpoint",
      (s, d) => {
        val firsts = Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"),
            explode(expr(TextFunctions.tokenShinglesSql("__toks", 3))).as("term"))
          .groupBy("term").agg(min("doc_id").as("__first"))
        val n = t(s, d, "documents").agg(max("doc_id").as("__maxid"))
        firsts.crossJoin(broadcast(n))
          // decile of the FIRST document that minted the term:
          // ceil(10·(first+1)/(max+1)) clamped to 10 (ids are dense
          // 0..max in the fixtures, but the bucketing is rank-free
          // so sparse ids only skew bucket widths, not correctness)
          .select(least(lit(10L),
            expr("CAST(ceil(10.0D * (CAST(__first AS DOUBLE) + 1.0D) / (CAST(__maxid AS DOUBLE) + 1.0D)) AS BIGINT)"))
            .as("decile"))
          .groupBy("decile").agg(count(lit(1)).as("n_new_terms"))
          .select(col("decile"), col("n_new_terms"),
            sum("n_new_terms").over(org.apache.spark.sql.expressions.Window
              .orderBy("decile").rowsBetween(
                org.apache.spark.sql.expressions.Window.unboundedPreceding,
                org.apache.spark.sql.expressions.Window.currentRow))
              .as("vocab_size"))
      },
      Some(s"""WITH tk0 AS (SELECT doc_id, $dkTokens AS tk FROM documents),
              |tk AS (SELECT doc_id, unnest(list_distinct(list_transform(
              |    range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' ')))) AS term
              |  FROM tk0 WHERE len(tk) >= 3),
              |fs AS (SELECT term, min(doc_id) AS f FROM tk GROUP BY 1),
              |mx AS (SELECT max(doc_id) AS m FROM documents),
              |dc AS (SELECT least(10, ceil(10.0 * (f::DOUBLE + 1.0) / (m::DOUBLE + 1.0))::BIGINT) AS decile
              |  FROM fs, mx),
              |g AS (SELECT decile, count(*)::BIGINT AS n_new_terms FROM dc GROUP BY 1)
              |SELECT decile, n_new_terms,
              |  sum(n_new_terms) OVER (ORDER BY decile
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS vocab_size
              |FROM g""".stripMargin)),

    // ── Cross-source duplication matrix: verified near-dup pairs
    //    bucketed by the (source, source) pair, normalized against the
    //    smaller side's corpus — "how much of source B is already in
    //    source A", the number that decides whether licensing /
    //    crawling a new source adds anything. Ordered so (a,b)==(b,a)
    //    lands in one cell. Pair list is index-bounded; the only joins
    //    are two id→source lookups against a pair-sized frame and a
    //    broadcast of the K-row per-source counts. ──
    QueryDef(
      "dedup_cross_source_matrix",
      "near-dup pair counts per ordered source pair + ppm of the smaller source",
      (s, d) => {
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        val cnt = src.groupBy("source").agg(count(lit(1)).as("n_docs"))
        neardupPairs(s, d).select("id_a", "id_b")
          .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")), Seq("id_a"))
          .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")), Seq("id_b"))
          .select(least(col("__sa"), col("__sb")).as("source_a"),
            greatest(col("__sa"), col("__sb")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_pairs"))
          .join(broadcast(cnt.select(col("source").as("source_a"), col("n_docs").as("__na"))),
            Seq("source_a"))
          .join(broadcast(cnt.select(col("source").as("source_b"), col("n_docs").as("__nb"))),
            Seq("source_b"))
          .select(col("source_a"), col("source_b"), col("n_pairs"),
            expr("""CAST((2000000 * CAST(n_pairs AS DECIMAL(38,0)) + least(__na, __nb))
                    div (2 * CAST(least(__na, __nb) AS DECIMAL(38,0))) AS BIGINT)""")
              .as("overlap_ppm"))
      },
      Some(s"""WITH $dkNeardupCtes,
              |sel AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |src AS (SELECT doc_id, source FROM documents),
              |cnt AS (SELECT source, count(*)::BIGINT AS n_docs FROM src GROUP BY 1),
              |cells AS (SELECT least(a.source, b.source) AS source_a,
              |    greatest(a.source, b.source) AS source_b, count(*)::BIGINT AS n_pairs
              |  FROM sel JOIN src a ON a.doc_id = sel.id_a
              |  JOIN src b ON b.doc_id = sel.id_b
              |  GROUP BY 1, 2)
              |SELECT source_a, source_b, n_pairs,
              |  ((2000000 * n_pairs::HUGEINT + least(na.n_docs, nb.n_docs))
              |    // (2 * least(na.n_docs, nb.n_docs)::HUGEINT))::BIGINT AS overlap_ppm
              |FROM cells JOIN cnt na ON na.source = source_a
              |  JOIN cnt nb ON nb.source = source_b""".stripMargin)),

    // ── Leakage-free split PRODUCER — the fix that the contamination
    //    matrix above motivates: whole near-dup clusters assigned
    //    ATOMICALLY to train/val/test by running the seeded hash draw
    //    on the cluster REPRESENTATIVE (the component min-label;
    //    singletons draw on their own id, so the un-clustered corpus
    //    keeps split_train_val_test's exact assignment). Cross-split
    //    near-dup pairs are impossible by construction — both pair
    //    sides share a representative, hence a draw, hence a split
    //    (property-tested in TextDedupSplitSpec). Scale shape: CC over
    //    the index-bounded pair list (never the corpus), one left join
    //    of the corpus against the cluster map (which is pair-sized,
    //    broadcastable in practice), and the same overflow-safe
    //    mod-before-multiply hash as split_train_val_test. ──
    QueryDef(
      "split_by_cluster",
      "leakage-free 80/10/10 split: whole near-dup clusters share one hash draw via their representative",
      (s, d) => {
        val comp = graft.operators.Components
          .connectedComponents(neardupPairs(s, d), "id_a", "id_b", edgesDistinct = true)
          .select(col("id").as("doc_id"), col("component"))
        t(s, d, "documents").select("doc_id")
          .join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("rep"))
          .withColumn("__h",
            (((col("rep") % 2147483647L + 2147483647L) % 2147483647L)
              * 2654435761L + 97L) % 100L)
          .select(col("doc_id"), col("rep"),
            when(col("__h") < 80, "train")
              .when(col("__h") < 90, "val").otherwise("test").as("split"))
      },
      Some(s"""WITH RECURSIVE $dkNeardupCtes,
              |pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |uedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              |  UNION SELECT id_b, id_a FROM pairs),
              |reach AS (
              |  SELECT src AS id, src AS r FROM uedges
              |  UNION
              |  SELECT e.src AS id, reach.r FROM uedges e JOIN reach ON reach.id = e.dst),
              |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
              |rep AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
              |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
              |SELECT doc_id, rep,
              |  CASE WHEN (((rep % 2147483647 + 2147483647) % 2147483647) * 2654435761 + 97) % 100 < 80 THEN 'train'
              |       WHEN (((rep % 2147483647 + 2147483647) % 2147483647) * 2654435761 + 97) % 100 < 90 THEN 'val'
              |       ELSE 'test' END AS split
              |FROM rep""".stripMargin),
      bench = true),

    // ── Near-dup benchmark decontamination: the fuzzy twin of
    //    `decontam_keep` (which removes exact matches). Every VERIFIED
    //    near-dup pair (shared memoized band index, exact-Jaccard
    //    rescore ≥ 0.8) touching a benchmark doc (doc_id % 17 == 0, the
    //    stand-in eval set) flags its non-benchmark side — the docs a
    //    training corpus must drop to avoid fuzzy eval leakage. Pair
    //    list is index-bounded; the corpus is never rescanned. ──
    QueryDef(
      "decontam_neardup",
      "training docs near-duplicating a benchmark doc (fuzzy decontamination list)",
      (s, d) => {
        val pairs = neardupPairs(s, d).select("id_a", "id_b")
        pairs.select(col("id_a").as("doc_id"), col("id_b").as("other"))
          .union(pairs.select(col("id_b").as("doc_id"), col("id_a").as("other")))
          .filter(col("doc_id") % 17 =!= 0 && col("other") % 17 === 0)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_benchmark_dups"))
      },
      Some(s"""WITH $dkNeardupCtes,
              |sel AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8),
              |sides AS (SELECT id_a AS doc_id, id_b AS other FROM sel
              |  UNION ALL SELECT id_b, id_a FROM sel)
              |SELECT doc_id, count(*) AS n_benchmark_dups FROM sides
              |WHERE doc_id % 17 <> 0 AND other % 17 = 0
              |GROUP BY 1""".stripMargin)),

    // ── Length-bucketed inference batching: docs grouped into power-of-
    //    two token-length buckets, then fixed-size batches within each
    //    bucket (minimizes padding waste at serving time). Within-bucket
    //    position via partitioned row_number; at real scale the batch
    //    key composes with a shard id exactly like `shuffle_shards`
    //    (batching is per-worker anyway), keeping the window partition
    //    count proportional to the cluster. ──
    QueryDef(
      "batch_by_length",
      "power-of-two length buckets + fixed-size batch ids (padding-efficient serving)",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("doc_id")
        Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .withColumn("n_tokens", TextFunctions.tokenCount("__toks"))
          .withColumn("bucket",
            when(col("n_tokens") <= 64, 64L).when(col("n_tokens") <= 128, 128L)
              .when(col("n_tokens") <= 256, 256L).when(col("n_tokens") <= 512, 512L)
              .otherwise(1024L))
          .withColumn("batch_id",
            expr("(CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) - 1) div 32"))
          .select("doc_id", "n_tokens", "bucket", "batch_id")
      },
      Some(s"""SELECT doc_id, n_tokens, bucket,
              |  (CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) - 1) // 32 AS batch_id
              |FROM (SELECT doc_id, len($dkTokens) AS n_tokens,
              |  CASE WHEN len($dkTokens) <= 64 THEN 64 WHEN len($dkTokens) <= 128 THEN 128
              |       WHEN len($dkTokens) <= 256 THEN 256 WHEN len($dkTokens) <= 512 THEN 512
              |       ELSE 1024 END::BIGINT AS bucket
              |FROM documents)""".stripMargin)),

    // ── Sparse cosine pairs via an INVERTED INDEX: term-frequency
    //    vectors never materialize — candidate pairs come from the
    //    (token → docs) postings join, pruned by document frequency
    //    BEFORE the self-join. The df cut is max(50, |docs|/10) but
    //    ABSOLUTELY capped at 10 000 (`MaxDf`, the `Dedup.MaxBucket`
    //    discipline): a proportional-only cut re-admits quadratic hot
    //    tokens as the corpus grows — a token in n/10 of 10⁹ docs
    //    would emit 10¹⁶ candidate pairs; with the cap no single token
    //    can ever contribute more than MaxDf² ≈ 10⁸ pairs regardless
    //    of corpus size. Docs whose squared norm exceeds `MaxN2`=10¹²
    //    (a million-token doc) leave the pairing via a doc-keyed semi
    //    join — they belong to the banding path, not pairwise cosine.
    //    The pair score is cosine² in 1e-6 fixed point, decided
    //    entirely in integers: num = Σ tfₐ·tf_b and norms² are integer
    //    sums, score_e6 = num²·10⁶ div (na²·nb²) computed with
    //    DECIMAL(38,0) intermediates — under the MaxN2 guard
    //    Cauchy-Schwarz gives num² ≤ na²·nb² ≤ 10²⁴, so num²·10⁶ ≤
    //    10³⁰ < 10³⁸: provably exact, no wrap, no ANSI throw (the
    //    oracle uses HUGEINT for the same window). No sqrt, no float
    //    anywhere; the top-20 cut is a (score, id_a, id_b) total
    //    order, so no engine pair can disagree. The sparse twin of
    //    sim_emb_neardup; the plan is TakeOrderedAndProject over the
    //    pair aggregate. ──
    QueryDef(
      "txt_sparse_cosine_pairs",
      "inverted-index sparse-TF top-20 similar pairs (df-pruned postings, integer cosine² score)",
      (s, d) => {
        // Eager cut (r17 optimization): tf feeds FOUR consumers (norms,
        // doc count, df table, pruned postings) whose column pruning
        // diverges their exchanges, so without the cut the corpus was
        // re-tokenized per consumer (two full passes measured). The
        // frame is (doc, term)-sized — the skill's K-row checkpoint
        // discipline; at scale this is the stored postings table.
        val tf = Dedup.stageThenSpread(t(s, d, "documents"),
            "__toks" -> expr(TextFunctions.tokensSql("text")))
          .select(col("doc_id"), explode(col("__toks")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        // norm guard: docs with n2 > MaxN2 (≈ a million tokens) leave
        // the pairing entirely — bounds every later intermediate. The
        // oversized set is pathological-by-definition (docs beyond a
        // million tokens), so it is broadcast and the postings exclude
        // it with a shuffle-free anti join rather than a doc-keyed
        // semi join (which would re-shuffle the whole postings frame).
        val n2all = tf.groupBy("doc_id").agg(sum(col("cnt") * col("cnt")).as("n2"))
        val n2 = n2all.filter(col("n2") <= lit(SparseCosine.MaxN2))
        val oversized = n2all.filter(col("n2") > lit(SparseCosine.MaxN2)).select("doc_id")
        // df cut scales with the corpus — max(50, |docs|/10) — but is
        // absolutely capped at MaxDf so no token admits a quadratic
        // posting list at any corpus size. |docs| arrives as a
        // broadcast 1-row aggregate, not a driver collect.
        val nd = tf.select("doc_id").distinct().agg(count(lit(1)).as("__nd"))
        val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        // (`pruned` itself stays UNCUT: the df-cap plan gate asserts
        // the cut below both self-join inputs, and a checkpoint would
        // hide it behind a LogicalRDD; the duplicated work above the
        // tf cut is one cheap df join per side.)
        val pruned = tf.join(dft, Seq("tok")).crossJoin(broadcast(nd))
          .filter(col("df") <= least(
            greatest(lit(50L), expr("__nd div 10")), lit(SparseCosine.MaxDf)))
          .join(broadcast(oversized), Seq("doc_id"), "left_anti")
          .select("doc_id", "tok", "cnt")
        val num = pruned.select(col("doc_id").as("id_a"), col("tok"), col("cnt").as("ca"))
          .join(pruned.select(col("doc_id").as("id_b"), col("tok"), col("cnt").as("cb")),
            Seq("tok"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(sum(col("ca") * col("cb")).as("num"))
        num
          .join(n2.select(col("doc_id").as("id_a"), col("n2").as("na2")), Seq("id_a"))
          .join(n2.select(col("doc_id").as("id_b"), col("n2").as("nb2")), Seq("id_b"))
          .withColumn("score_e6",
            expr("CAST((CAST(num AS DECIMAL(38,0)) * num * 1000000) div " +
              "(CAST(na2 AS DECIMAL(38,0)) * nb2) AS BIGINT)"))
          .select("id_a", "id_b", "num", "score_e6")
          .orderBy(col("score_e6").desc, col("id_a"), col("id_b"))
          .limit(20)
      },
      Some(s"""WITH tf AS (SELECT doc_id, tok, count(*) AS cnt FROM (
              |  SELECT doc_id, unnest($dkTokens) AS tok FROM documents)
              |  GROUP BY 1, 2),
              |n2a AS (SELECT doc_id, sum(cnt * cnt) AS n2 FROM tf GROUP BY 1),
              |n2 AS (SELECT doc_id, n2 FROM n2a WHERE n2 <= ${SparseCosine.MaxN2}),
              |nd AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
              |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
              |pruned AS (SELECT tf.doc_id, tf.tok, tf.cnt FROM tf
              |  JOIN dft ON dft.tok = tf.tok, nd
              |  WHERE dft.df <= least(greatest(50, nd.nd // 10), ${SparseCosine.MaxDf})
              |    AND tf.doc_id NOT IN (SELECT doc_id FROM n2a WHERE n2 > ${SparseCosine.MaxN2})),
              |num AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |    sum(a.cnt * b.cnt) AS num
              |  FROM pruned a JOIN pruned b ON a.tok = b.tok AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id_a, id_b, num::BIGINT AS num,
              |  ((num::HUGEINT * num * 1000000) // (x.n2::HUGEINT * y.n2))::BIGINT AS score_e6
              |FROM num JOIN n2 x ON x.doc_id = id_a JOIN n2 y ON y.doc_id = id_b
              |ORDER BY score_e6 DESC, id_a, id_b LIMIT 20""".stripMargin),
      bench = true),

    // ── EXACT SUBSTRING duplication across documents (the
    //    "deduplicating training data makes models better" primitive):
    //    fixed-width 48-char windows, FULL stride on one join side and
    //    stride-8 on the other — any shared substring of length ≥ 55
    //    (48 + 8 − 1) is then guaranteed to produce a matching window
    //    pair, at 1/8th the self-join input a full×full window join
    //    would need. Hot-window guard is ABSOLUTE (df > 1000 boilerplate
    //    windows leave the index via broadcast anti join — the
    //    MaxDf/MaxBucket discipline). The join keys on the 64-bit
    //    xxhash64 of each window — shuffle partitioning, sort and hash
    //    probes all pay 8-byte keys instead of 48-char strings — and a
    //    string-equality RESCORE of hash-equal candidates keeps the
    //    result exact (a collision would need two distinct 48-char
    //    windows sharing a 64-bit hash AND living in joinable docs). ──
    QueryDef(
      "dedup_substring_windows",
      "cross-document exact substring duplication via strided 48-char window join",
      (s, d) => {
        // ONE full-stride generate+hash pass (r17 optimization): the
        // stride-8 side is a SUBSET of the full-stride windows (same
        // 48-char substrings at positions ≡ 0 mod 8, win_idx IS the
        // position at stride 1), so its membership folds through the
        // same distinct aggregate as a max(is_b) flag instead of a
        // second corpus scan — see [[windowIndex]] (CharWindows
        // GENERATOR inside, so windows stream out of the scan lazily).
        val wins = windowIndex(s, d)
        val wa = wins.select("doc_id", "h", "w")
        val wb = wins.filter(col("is_b")).select("doc_id", "h", "w")
        // count(*) == countDistinct(doc_id) here: wa rows are already
        // distinct per (doc_id, h, w), so the per-(h, w) doc_ids are
        // unique — the plain count drops the count-distinct Expand.
        val hot = wa.groupBy("h", "w")
          .agg(count(lit(1)).as("df")).filter(col("df") > 1000)
          .select("h", "w")
        // The cap must hit BOTH join inputs BEFORE the h-keyed pair
        // join: one boilerplate window shared by 10^6 docs would
        // otherwise materialize ~10^12/2 pair rows that a post-join
        // anti-join only deletes after the blowup. Output-identical
        // (every hot-window pair is removed either way); plan-gated in
        // PlansSpec: LeftAnti strictly below the Inner pair join.
        val waCold = wa.join(broadcast(hot), Seq("h", "w"), "left_anti")
        val wbCold = wb.join(broadcast(hot), Seq("h", "w"), "left_anti")
        waCold.as("a").join(wbCold.as("b"), Seq("h"))
          .filter(col("a.w") === col("b.w") && // rescore: hash-equal → string-equal
            col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"),
            col("a.w").as("w"))
          .groupBy("id_a", "id_b").agg(countDistinct("w").as("n_shared"))
          .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
          .limit(50)
      },
      Some("""WITH docs AS (SELECT doc_id, trim(text) AS tx FROM documents
             |  WHERE length(trim(text)) >= 48),
             |wa AS (SELECT DISTINCT doc_id, substr(tx, i + 1, 48) AS w FROM (
             |  SELECT doc_id, tx, unnest(range(0, length(tx) - 47)) AS i FROM docs)),
             |wb AS (SELECT DISTINCT doc_id, substr(tx, i + 1, 48) AS w FROM (
             |  SELECT doc_id, tx, unnest(range(0, length(tx) - 47, 8)) AS i FROM docs)),
             |hot AS (SELECT w FROM (
             |  SELECT w, count(DISTINCT doc_id) AS df FROM wa GROUP BY 1) WHERE df > 1000),
             |pairs AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
             |    greatest(a.doc_id, b.doc_id) AS id_b, a.w
             |  FROM wa a JOIN wb b ON a.w = b.w AND a.doc_id <> b.doc_id
             |  WHERE a.w NOT IN (SELECT w FROM hot))
             |SELECT id_a, id_b, count(DISTINCT w)::BIGINT AS n_shared
             |FROM pairs GROUP BY 1, 2
             |ORDER BY n_shared DESC, id_a, id_b LIMIT 50""".stripMargin),
      bench = true),

    // ── CONTENT-DEFINED chunking (Rabin-style CDC): boundaries where
    //    the rolling 16-char polynomial hash ≡ 0 (mod 64), so an
    //    insertion near the start of a duplicated document shifts NO
    //    downstream chunk — boundaries re-synchronize and the shared
    //    region dedups chunk-for-chunk, which fixed-offset windows
    //    cannot do. The Spark side is one lazy O(n) generator pass per
    //    document (graft.functions.CdcChunks); the oracle recomputes
    //    every window hash at O(n·w) — same boundary set. ──
    QueryDef(
      "cdc_chunks",
      "content-defined chunks: rolling-hash boundaries (16-char window, 1/64 cut rate)",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_cdc_chunks(text, 16, 64)").as(Seq("chunk_idx", "start", "chunk")))
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            col("start").cast("long").as("start"),
            length(col("chunk")).cast("long").as("len"),
            md5(col("chunk")).as("chunk_hash"))
      },
      Some(s"""WITH $dkCdcCtes,
             |seq AS (SELECT doc_id, p,
             |    lag(p, 1, 0) OVER (PARTITION BY doc_id ORDER BY p) AS prev,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS chunk_idx
             |  FROM cuts)
             |SELECT s.doc_id, s.chunk_idx::BIGINT AS chunk_idx,
             |  (s.prev + 1)::BIGINT AS start, (s.p - s.prev)::BIGINT AS len,
             |  md5(substr(d.tx, (s.prev + 1)::INT, (s.p - s.prev)::INT)) AS chunk_hash
             |FROM seq s JOIN docs d ON d.doc_id = s.doc_id""".stripMargin)),

    // ── Chunk-level dedup over the CDC chunks: identical content
    //    regions shared across documents, found by grouping on the
    //    chunk hash (map-side partial agg — the group key is a hash,
    //    so the shuffle is uniform; no join at all). ──
    QueryDef(
      "cdc_shared_chunks",
      "CDC chunks (len >= 24) shared across documents, by chunk hash",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_cdc_chunks(text, 16, 64)").as(Seq("chunk_idx", "start", "chunk")))
          .filter(length(col("chunk")) >= 24)
          .groupBy(md5(col("chunk")).as("chunk_hash"))
          .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occur"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("n_docs").desc, col("n_occur").desc, col("chunk_hash"))
          .limit(50)
      },
      Some(s"""WITH $dkCdcCtes,
             |seq AS (SELECT doc_id, p,
             |    lag(p, 1, 0) OVER (PARTITION BY doc_id ORDER BY p) AS prev
             |  FROM cuts),
             |ch AS (SELECT s.doc_id,
             |    md5(substr(d.tx, (s.prev + 1)::INT, (s.p - s.prev)::INT)) AS chunk_hash
             |  FROM seq s JOIN docs d ON d.doc_id = s.doc_id
             |  WHERE s.p - s.prev >= 24)
             |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occur
             |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
             |ORDER BY n_docs DESC, n_occur DESC, chunk_hash LIMIT 50""".stripMargin)),

    // ── Dedup-at-ingest for CDC chunks: a new document batch scored by
    //    how much of it is ALREADY in the stored chunk index (the
    //    storage/dataset-dedup decision signal — "this 2 GB upload is
    //    97% known chunks"). The join is keyed on the chunk hash, so
    //    the shuffle is uniform by construction; novelty is an integer
    //    rational. ──
    QueryDef(
      "cdc_incremental_novelty",
      "per-new-doc novelty vs the stored CDC chunk index (doc_id < 400 = stored)",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val ch = Dedup.spread(t(s, d, "documents"))
          .select(col("doc_id"),
            expr("graft_cdc_chunks(text, 16, 64)").as(Seq("chunk_idx", "start", "chunk")))
          .select(col("doc_id"), md5(col("chunk")).as("h"))
        val stored = ch.filter(col("doc_id") < 400).select("h").distinct()
        ch.filter(col("doc_id") >= 400)
          .join(stored.withColumn("known", lit(1)), Seq("h"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"), count(col("known")).as("n_known"))
          .select(col("doc_id"), col("n_chunks"), col("n_known"),
            expr("(n_chunks - n_known) * 1000000L div n_chunks").as("novelty_e6"))
      },
      Some(s"""WITH $dkCdcCtes,
             |seq AS (SELECT doc_id, p,
             |    lag(p, 1, 0) OVER (PARTITION BY doc_id ORDER BY p) AS prev
             |  FROM cuts),
             |ch AS (SELECT s.doc_id,
             |    md5(substr(d.tx, (s.prev + 1)::INT, (s.p - s.prev)::INT)) AS h
             |  FROM seq s JOIN docs d ON d.doc_id = s.doc_id),
             |stored AS (SELECT DISTINCT h FROM ch WHERE doc_id < 400),
             |nb AS (SELECT doc_id, h FROM ch WHERE doc_id >= 400)
             |SELECT nb.doc_id, count(*)::BIGINT AS n_chunks,
             |  count(stored.h)::BIGINT AS n_known,
             |  (((count(*) - count(stored.h)) * 1000000) // count(*))::BIGINT AS novelty_e6
             |FROM nb LEFT JOIN stored ON stored.h = nb.h
             |GROUP BY 1""".stripMargin)),

    // ── EXACT set-similarity join via PREFIX FILTERING (ppjoin-style):
    //    token-3-shingle-SET Jaccard ≥ 0.7 pairs with a COMPLETENESS
    //    GUARANTEE — unlike MinHash/LSH there are no probabilistic
    //    misses. (Shingles, not raw tokens: the fixture corpus has a
    //    31-word vocabulary, so raw token sets overlap for 41% of ALL
    //    pairs — the same small-vocab collapse the MinHash pipeline
    //    documents.) Each doc indexes only its (n − ⌈0.7·n⌉ + 1)
    //    RAREST shingles (global df asc — prefix elements are rare by
    //    construction, so the candidate join is naturally skew-light:
    //    the ppjoin insight); any pair meeting the threshold MUST
    //    collide on at least one prefix element. Candidates are then
    //    verified by exact intersection counting, thresholded by
    //    integer cross-multiplication (inter·10 ≥ 7·union) — no floats
    //    anywhere. ──
    QueryDef(
      "dedup_setjoin_prefix",
      "exact shingle-set Jaccard >= 0.7 join via prefix filtering (no LSH misses)",
      (s, d) => {
        val tf = graft.functions.TextFunctions
        val tk = Dedup.spread(t(s, d, "documents"))
          .withColumn("__cl", expr(s"lower(${tf.cleanAsciiSql("text")})"))
          .withColumn("__toks", expr(tf.tokensSql("__cl")))
          .select(col("doc_id"),
            explode(expr(tf.tokenShinglesSql("__toks", 3))).as("tok"))
          .localCheckpoint(true) // feeds df, sizes, prefix AND verification
        val dfq = tk.groupBy("tok").agg(count(lit(1)).as("df"))
        val szq = tk.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val pfx = tk.join(dfq, "tok").join(szq, "doc_id")
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("df"), col("tok"))))
          .filter(col("rk") <= col("n") - expr("(7 * n + 9) div 10") + 1)
          .select("doc_id", "tok")
        val cand = pfx.select(col("doc_id").as("id_a"), col("tok"))
          .join(pfx.select(col("doc_id").as("id_b"), col("tok")), Seq("tok"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        val inter = cand
          .join(tk.select(col("doc_id").as("id_a"), col("tok")), Seq("id_a"))
          .join(tk.select(col("doc_id").as("id_b"), col("tok")), Seq("id_b", "tok"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        inter
          .join(szq.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
          .join(szq.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
          .filter(expr("inter * 10 >= 7 * (na + nb - inter)"))
          .select(col("id_a"), col("id_b"), col("inter"), col("na"), col("nb"),
            expr("inter * 1000000L div (na + nb - inter)").as("jac_e6"))
      },
      Some(s"""WITH tk AS (SELECT doc_id, unnest(${dkTokShingles(dkClean)}) AS tok FROM documents),
             |dfq AS (SELECT tok, count(*) AS df FROM tk GROUP BY 1),
             |szq AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
             |rk AS (SELECT tk.doc_id, tk.tok, s.n,
             |    row_number() OVER (PARTITION BY tk.doc_id ORDER BY d.df, tk.tok) AS rk
             |  FROM tk JOIN dfq d ON d.tok = tk.tok JOIN szq s ON s.doc_id = tk.doc_id),
             |pfx AS (SELECT doc_id, tok FROM rk WHERE rk <= n - (7 * n + 9) // 10 + 1),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM pfx a JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id),
             |itr AS (SELECT c.id_a, c.id_b, count(*) AS inter
             |  FROM cand c JOIN tk ta ON ta.doc_id = c.id_a
             |  JOIN tk tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, inter::BIGINT AS inter, sa.n::BIGINT AS na,
             |  sb.n::BIGINT AS nb,
             |  ((inter * 1000000) // (sa.n + sb.n - inter))::BIGINT AS jac_e6
             |FROM itr JOIN szq sa ON sa.doc_id = id_a JOIN szq sb ON sb.doc_id = id_b
             |WHERE inter * 10 >= 7 * (sa.n + sb.n - inter)""".stripMargin)),

    // ── LSH quality eval: measured RECALL of the production MinHash-
    //    LSH near-dup pipeline against an exact ground truth — the
    //    "is 16 bands × 2 rows enough?" measurement a pipeline owner
    //    re-runs after every parameter change. Ground truth is the
    //    prefix-filtered EXACT Jaccard ≥ 0.8 join over the same
    //    distinct-shingle-hash sets the pipeline rescores (complete:
    //    no LSH misses; integer cross-multiplied threshold), so every
    //    pipeline pair is a true pair and recall = hits / truth. Both
    //    sides are bucket-bounded (prefix tokens / capped bands) — the
    //    eval itself rides the scale path, no all-pairs scan. ──
    QueryDef(
      "dedup_lsh_recall",
      "recall of banded MinHash-LSH near-dup pairs vs exact set-join ground truth",
      (s, d) => {
        val hs = Dedup.withShingleHashes(t(s, d, "documents"), "text")
          .select(col("doc_id"), explode(array_distinct(col("shingle_hashes"))).as("tok"))
          .localCheckpoint(true) // feeds df, sizes, prefix AND verification
        val dfq = hs.groupBy("tok").agg(count(lit(1)).as("df"))
        val szq = hs.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val pfx = hs.join(dfq, "tok").join(szq, "doc_id")
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("df"), col("tok"))))
          .filter(col("rk") <= col("n") - expr("(8 * n + 9) div 10") + 1)
          .select("doc_id", "tok")
        val cand = pfx.select(col("doc_id").as("id_a"), col("tok"))
          .join(pfx.select(col("doc_id").as("id_b"), col("tok")), Seq("tok"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        val exact = cand
          .join(hs.select(col("doc_id").as("id_a"), col("tok")), Seq("id_a"))
          .join(hs.select(col("doc_id").as("id_b"), col("tok")), Seq("id_b", "tok"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
          .join(szq.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
          .join(szq.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
          .filter(expr("inter * 10 >= 8 * (na + nb - inter)"))
          .select("id_a", "id_b")
        val lsh = neardupPairs(s, d).select(col("id_a"), col("id_b"), lit(1).as("__hit"))
        exact.join(lsh, Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
          .crossJoin(lsh.agg(count(lit(1)).as("n_lsh"))) // 1-row aggregate broadcast
          .select(col("n_exact"), col("n_lsh"), col("n_hit"),
            expr("n_hit * 1000000L div n_exact").as("recall_e6"))
      },
      Some(s"""WITH $dkNeardupCtes,
              |tk AS (SELECT doc_id, unnest(h) AS tok FROM hh),
              |dfq AS (SELECT tok, count(*) AS df FROM tk GROUP BY 1),
              |szq AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
              |rk AS (SELECT tk.doc_id, tk.tok, s.n,
              |    row_number() OVER (PARTITION BY tk.doc_id ORDER BY d.df, tk.tok) AS rk
              |  FROM tk JOIN dfq d ON d.tok = tk.tok JOIN szq s ON s.doc_id = tk.doc_id),
              |pfx AS (SELECT doc_id, tok FROM rk WHERE rk <= n - (8 * n + 9) // 10 + 1),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM pfx a JOIN pfx b ON a.tok = b.tok AND a.doc_id < b.doc_id),
              |itr AS (SELECT c.id_a, c.id_b, count(*) AS inter
              |  FROM cand c JOIN tk ta ON ta.doc_id = c.id_a
              |  JOIN tk tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
              |  GROUP BY 1, 2),
              |exact AS (SELECT id_a, id_b FROM itr
              |  JOIN szq sa ON sa.doc_id = id_a JOIN szq sb ON sb.doc_id = id_b
              |  WHERE inter * 10 >= 8 * (sa.n + sb.n - inter)),
              |lsh AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.8)
              |SELECT (SELECT count(*) FROM exact)::BIGINT AS n_exact,
              |  (SELECT count(*) FROM lsh)::BIGINT AS n_lsh,
              |  (SELECT count(*) FROM exact e JOIN lsh l
              |     ON e.id_a = l.id_a AND e.id_b = l.id_b)::BIGINT AS n_hit,
              |  ((SELECT count(*) FROM exact e JOIN lsh l
              |     ON e.id_a = l.id_a AND e.id_b = l.id_b) * 1000000
              |   // (SELECT count(*) FROM exact))::BIGINT AS recall_e6""".stripMargin)),

    // ── Dataset fingerprint for drift detection / data contracts: per-
    //    source row count + order-insensitive content checksum. Each
    //    row contributes md5(doc_id || '|' || text) reduced mod 2³¹ and
    //    the checksum is the SUM — commutative, so any partitioning,
    //    any row order, any engine produces the same BIGINT, yet any
    //    single-row change moves it. The cheap "did anything change
    //    between pipeline runs" primitive (a content-defined version id
    //    a lakehouse can store per snapshot). ──
    QueryDef(
      "corpus_checksum",
      "per-source row count + order-insensitive content checksum (drift detection)",
      (s, d) =>
        t(s, d, "documents")
          .withColumn("__h",
            expr("conv(substring(md5(concat(CAST(doc_id AS STRING), '|', text)), 1, 15), 16, 10)")
              .cast("long") % 2147483647L)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("__h").as("checksum")),
      Some("""SELECT source, count(*) AS n_docs,
             |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 15))::BIGINT
             |      % 2147483647)::BIGINT AS checksum
             |FROM documents GROUP BY source""".stripMargin)),

    // ── SimHash ──
    QueryDef(
      "dedup_simhash",
      "32-bit SimHash from token-hash bit majorities",
      (s, d) => Dedup.simhash(t(s, d, "documents"), "text", "doc_id"),
      Some(s"""WITH th AS (SELECT doc_id,
              |  list_transform(regexp_split_to_array(trim($dkClean), '\\s+'), t -> ${dkPoly("t")}) AS h
              |  FROM documents)
              |SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT, range(0, 32)), (acc, b) -> acc +
              |    CASE WHEN list_reduce(list_prepend(0::BIGINT, h),
              |      (s2, x) -> s2 + CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
              |    THEN (1::BIGINT << b) ELSE 0 END) AS simhash
              |FROM th""".stripMargin)),

    // ── Exact hamming near-dup pairs over the SimHash: radius+1 = 4
    //    disjoint 8-bit bands, pigeonhole-complete (≤ 3 differing bits
    //    cannot touch all 4 bands, so some band matches exactly) — a
    //    band-keyed equi-join + bit_count rescore, never an all-pairs
    //    scan. The hot-band cap is mirrored in the oracle (QUALIFY),
    //    like the sim_probe_recall contract; the 64-bit twin of this
    //    join serves the image/audio fingerprints (FingerprintSpec
    //    proves == brute force at every radius). ──
    QueryDef(
      "dedup_simhash_hamming",
      "hamming<=3 SimHash pairs via pigeonhole-complete 8-band join",
      (s, d) => graft.operators.Fingerprint.hammingNearDupPairs(
        Dedup.simhash(t(s, d, "documents"), "text", "doc_id"),
        "doc_id", "simhash", maxHamming = 3, bits = 32),
      Some(s"""WITH th AS (SELECT doc_id,
              |  list_transform(regexp_split_to_array(trim($dkClean), '\\s+'), t -> ${dkPoly("t")}) AS h
              |  FROM documents),
              |sh AS (SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT, range(0, 32)), (acc, b) -> acc +
              |    CASE WHEN list_reduce(list_prepend(0::BIGINT, h),
              |      (s2, x) -> s2 + CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
              |    THEN (1::BIGINT << b) ELSE 0 END) AS simhash
              |FROM th),
              |bands AS (SELECT doc_id, simhash, i AS pos, (simhash >> (8 * i)) & 255 AS band
              |  FROM sh, range(0, 4) t(i)),
              |ok AS (SELECT * FROM bands
              |  QUALIFY count(*) OVER (PARTITION BY pos, band) <= ${Dedup.MaxBucket}),
              |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
              |    a.simhash AS ha, b.simhash AS hb
              |  FROM ok a JOIN ok b ON a.pos = b.pos AND a.band = b.band
              |    AND a.doc_id < b.doc_id)
              |SELECT id_a, id_b, bit_count(xor(ha, hb))::INT AS hamming
              |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin),
      bench = true),

    // ── The index-SERVING lookup as a driver-visible row: a probe
    //    batch (docs with doc_id % 10 == 0) searched against the
    //    persisted-band-shaped index of the rest of the corpus — the
    //    batch twin of VectorStreams.fingerprintServe, benched so
    //    serving latency ratchets per round like the pair-join path.
    //    Probe bands join the capped index on (pos, band) only: query
    //    cost scales with bucket sizes, never index size. ──
    QueryDef(
      "fp_search_index",
      "probe fingerprints vs persisted band index: hamming<=3 hits",
      (s, d) => {
        val sh = Dedup.simhash(t(s, d, "documents"), "text", "doc_id")
          .localCheckpoint(true) // one simhash pass feeds index + probes
        val idx = graft.operators.Fingerprint.bandsOf(
          sh.filter(col("doc_id") % 10 =!= 0), "doc_id", "simhash",
          bits = 32, nBands = 4)
        graft.operators.Fingerprint.searchIndex(idx,
          sh.filter(col("doc_id") % 10 === 0), "doc_id", "simhash",
          maxHamming = 3, bits = 32)
      },
      Some(s"""WITH th AS (SELECT doc_id,
              |  list_transform(regexp_split_to_array(trim($dkClean), '\\s+'), t -> ${dkPoly("t")}) AS h
              |  FROM documents),
              |sh AS (SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT, range(0, 32)), (acc, b) -> acc +
              |    CASE WHEN list_reduce(list_prepend(0::BIGINT, h),
              |      (s2, x) -> s2 + CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
              |    THEN (1::BIGINT << b) ELSE 0 END) AS simhash
              |FROM th),
              |ib AS (SELECT doc_id, simhash, i AS pos, (simhash >> (8 * i)) & 255 AS band
              |  FROM sh, range(0, 4) t(i) WHERE doc_id % 10 <> 0
              |  QUALIFY count(*) OVER (PARTITION BY pos, band) <= ${Dedup.MaxBucket}),
              |pb AS (SELECT doc_id, simhash, i AS pos, (simhash >> (8 * i)) & 255 AS band
              |  FROM sh, range(0, 4) t(i) WHERE doc_id % 10 = 0),
              |cand AS (SELECT DISTINCT p.doc_id AS probe_id, ib.doc_id AS id,
              |    p.simhash AS hp, ib.simhash AS hi
              |  FROM pb p JOIN ib ON p.pos = ib.pos AND p.band = ib.band)
              |SELECT probe_id, id, bit_count(xor(hp, hi))::INT AS hamming
              |FROM cand WHERE bit_count(xor(hp, hi)) <= 3""".stripMargin),
      bench = true),

    // ── Positional PHRASE search: exact multi-word occurrences via a
    //    positional inverted index — the precise form of benchmark
    //    decontamination (n-gram containment flags fuzzy overlap; this
    //    finds the verbatim phrase and how often). One shape for ANY
    //    number/length of phrases: postings (doc, pos, tok) join the
    //    BROADCAST phrase-token list on tok, anchor = pos − i groups
    //    candidate alignments, and an alignment with all len(phrase)
    //    positions matched is an occurrence — one keyed agg, never a
    //    per-word chained self-join (which would be len−1 joins and
    //    re-shuffle the postings each time). Only phrase tokens survive
    //    the broadcast join, so postings volume after the filter is
    //    bounded by the phrase vocabulary — the 100 TB-safe property. ──
    QueryDef(
      "phrase_search",
      "exact phrase occurrence counts per document via positional postings",
      (s, d) => {
        import s.implicits._
        val phrases = Seq((1L, "slow hash batch"), (2L, "row column sort"),
          (3L, "window fast query")).toDF("phrase_id", "phrase")
        val ptok = phrases.select(col("phrase_id"),
          posexplode(split(col("phrase"), " ")).as(Seq("i", "tok")))
        val plen = ptok.groupBy("phrase_id").agg(count(lit(1)).as("len"))
        val post = t(s, d, "documents")
          .select(col("doc_id"),
            posexplode(expr(TextFunctions.tokensSql("text"))).as(Seq("pos", "tok")))
        post.join(broadcast(ptok), "tok")
          .groupBy(col("doc_id"), col("phrase_id"),
            (col("pos") - col("i")).as("anchor"))
          .agg(count(lit(1)).as("m"))
          .join(broadcast(plen), "phrase_id")
          .filter(col("m") === col("len"))
          .groupBy("doc_id", "phrase_id")
          .agg(count(lit(1)).as("n_occ"))
      },
      Some("""WITH phrases(phrase_id, phrase) AS (
             |  VALUES (1, 'slow hash batch'), (2, 'row column sort'), (3, 'window fast query')),
             |pl AS (SELECT phrase_id, string_split(phrase, ' ') AS toks FROM phrases),
             |pidx AS (SELECT phrase_id, toks, unnest(range(len(toks))) AS i FROM pl),
             |ptok AS (SELECT phrase_id, i, toks[i + 1] AS tok FROM pidx),
             |plen AS (SELECT phrase_id, count(*) AS len FROM ptok GROUP BY 1),
             |tl AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l FROM documents),
             |idx AS (SELECT doc_id, l, unnest(range(len(l))) AS i FROM tl),
             |post AS (SELECT doc_id, i AS pos, l[i + 1] AS tok FROM idx),
             |hit AS (SELECT doc_id, phrase_id, pos - ptok.i AS anchor, count(*) AS m
             |  FROM post JOIN ptok USING (tok) GROUP BY 1, 2, 3)
             |SELECT doc_id, CAST(phrase_id AS BIGINT) AS phrase_id, count(*)::BIGINT AS n_occ
             |FROM hit JOIN plen USING (phrase_id)
             |WHERE m = len GROUP BY 1, 2""".stripMargin))
  )
}
