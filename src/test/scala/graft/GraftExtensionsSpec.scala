package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.AnalysisException

/** The SQL function surface: every registered kernel must be callable
  * from spark.sql and agree with the Scala-API operators it mirrors.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("graft_dot_f matches the Scala-API dot product") {
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT graft_dot_f(a, b) AS d FROM vecs")
      .head.getDouble(0)
    assert(sql === 32.0)
  }

  test("graft_simhash / graft_ngram_hash_set / intersect agree with operators") {
    Seq((1L, "the quick brown fox"), (2L, "the quick brown cat"))
      .toDF("id", "text").createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      """SELECT a.id AS i, b.id AS j,
        |  graft_intersect_count_sorted(graft_ngram_hash_set(a.text, 2),
        |                               graft_ngram_hash_set(b.text, 2)) AS common,
        |  graft_simhash(a.text) AS sig
        |FROM docs a JOIN docs b ON a.id < b.id""".stripMargin).head
    // bigrams: {the quick, quick brown, brown fox|cat} — 2 shared
    assert(viaSql.getLong(2) === 2L)
    val viaApi = Seq("the quick brown fox").toDF("text")
      .select(graft.operators.TextAnalysis.simHash($"text")).head.getLong(0)
    assert(viaSql.getLong(3) === viaApi)
  }

  test("graft_polyhash / graft_token_count / graft_ngram_hash_seq agree with operators") {
    Seq((1L, "the quick brown fox"), (2L, "emoji 😀 mix"))
      .toDF("id", "text").createOrReplaceTempView("tdocs")
    val viaSql = spark.sql(
      """SELECT id, graft_polyhash(text) AS ph, graft_token_count(text) AS tc,
        |       graft_ngram_hash_seq(text, 2) AS seq
        |FROM tdocs ORDER BY id""".stripMargin).collect()
    val viaApi = Seq((1L, "the quick brown fox"), (2L, "emoji 😀 mix"))
      .toDF("id", "text")
      .select($"id",
        graft.operators.TextAnalysis.polyHash($"text").as("ph"),
        graft.functions.tokenCountNative($"text").as("tc"),
        graft.functions.ngramHashSeq($"text", 2).as("seq"))
      .orderBy("id").collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      assert(s.getLong(1) === a.getLong(1))
      assert(s.getLong(2) === a.getLong(2))
      assert(s.getSeq[Long](3) === a.getSeq[Long](3))
    }
  }

  test("graft_bottomk aggregates the k smallest distinct values") {
    Seq(5L, 1L, 9L, 1L, 3L, 7L).toDF("x").createOrReplaceTempView("xs")
    val got = spark.sql("SELECT graft_bottomk(x, 3) AS bk FROM xs")
      .head.getSeq[Long](0)
    assert(got === Seq(1L, 3L, 5L))
  }

  test("graft_bottomk_pairs aggregates the k smallest distinct (h, v) pairs") {
    Seq((3L, 30L), (1L, 10L), (1L, 10L), (1L, 5L), (2L, 20L))
      .toDF("h", "v").createOrReplaceTempView("hv")
    val got = spark.sql("SELECT graft_bottomk_pairs(h, v, 3) AS sk FROM hv")
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((1L, 5L), (1L, 10L), (2L, 20L)))
  }

  test("graft_max_equal_run scans the max multiplicity of a sorted array") {
    val got = spark.sql(
      "SELECT graft_max_equal_run(array_sort(array(3L, 1L, 3L, 2L, 3L, 1L)))")
      .head.getLong(0)
    assert(got === 3L)
    assert(spark.sql(
      "SELECT graft_max_equal_run(CAST(array() AS ARRAY<BIGINT>))")
      .head.getLong(0) === 0L)
    // composes with the gram kernel into the SQL form of maxNgramRepeat
    Seq("p q r p q r p q").toDF("t").createOrReplaceTempView("docs_rep")
    val rep = spark.sql(
      """SELECT graft_max_equal_run(array_sort(graft_ngram_hash_seq(t, 2)))
        |FROM docs_rep""".stripMargin).head.getLong(0)
    assert(rep === 3L) // "p q" occurs 3x
  }

  test("curation functions agree with the Scala operators from pure SQL") {
    import graft.operators.{Sampling, TextAnalysis}
    Seq((1L, "mail x@y.io id 123456789 ip 10.0.0.1 and the rest of the words"))
      .toDF("id", "text").createOrReplaceTempView("cur")
    val sql = spark.sql(
      """SELECT graft_pii_redact(text) AS r, graft_quality_score(text) AS q,
        |       graft_hash_bucket(id, 100) AS b FROM cur""".stripMargin).head()
    assert(sql.getString(0) === "mail <EMAIL> id <DIGITS> ip <IP> and the rest of the words")
    val api = spark.table("cur").select(
      TextAnalysis.qualityScore(org.apache.spark.sql.functions.col("text")),
      Sampling.hashBucket(org.apache.spark.sql.functions.col("id"), 100)).head()
    assert(sql.getDouble(1) === api.getDouble(0))
    assert(sql.getLong(2) === api.getLong(1))
  }

  test("graft_pixel_stats / graft_pcm_stats agree with the Scala API from SQL") {
    import graft.queries.PixelFixtures
    Seq((0L, PixelFixtures.payload(0L)), (2L, PixelFixtures.payload(2L)),
      (7L, PixelFixtures.payload(7L)))
      .toDF("id", "p").createOrReplaceTempView("px_ext_spec")
    val viaSql = spark.sql(
      """SELECT id, graft_pixel_stats(p).lum_sum AS s,
        |  graft_pixel_stats(p).dhash AS d
        |FROM px_ext_spec ORDER BY id""".stripMargin).collect()
    val viaApi = spark.table("px_ext_spec")
      .select($"id", graft.functions.pixelStats($"p").getField("lum_sum"),
        graft.functions.pixelStats($"p").getField("dhash"))
      .orderBy("id").collect()
    assert(viaSql.map(_.toString).toSeq === viaApi.map(_.toString).toSeq)
    assert(viaSql(2).isNullAt(1)) // %10==7 truncation quarantines
    // PCM: one spec-true 2-sample WAV through SQL
    val wav = Array[Int](
      'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 1, 0,
      0x40, 0x1F, 0, 0, 0x80, 0x3E, 0, 0, 2, 0, 16, 0,
      'd', 'a', 't', 'a', 4, 0, 0, 0, 0xE8, 0x03, 0x18, 0xFC)
      .map(_.toByte)
    Seq((1L, wav)).toDF("id", "p").createOrReplaceTempView("pcm_ext_spec")
    val pcm = spark.sql(
      """SELECT graft_pcm_stats(p).sample_rate,
        |  graft_pcm_stats(p).n_samples, graft_pcm_stats(p).sum_q
        |FROM pcm_ext_spec""".stripMargin).collect()(0)
    assert((pcm.getLong(0), pcm.getLong(1), pcm.getLong(2)) ===
      ((8000L, 2L, 0L))) // samples +1000, -1000
  }

  test("literal-parameter misuse fails at analysis time") {
    Seq(1L).toDF("x").createOrReplaceTempView("one")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bottomk(x, x) FROM one").collect()
    }
    assert(e.isInstanceOf[AnalysisException] ||
      e.getMessage.contains("INT literal"))
  }

  test("url and heavy-hitter functions agree with the Scala operators") {
    Seq("https://Blog.Example.CO.UK:443/p?id=1&utm_source=f#x")
      .toDF("url").createOrReplaceTempView("urls")
    val row = spark.sql(
      """SELECT graft_url_normalize(url) AS n, graft_url_host(graft_url_normalize(url)) AS h,
        |       graft_url_domain(graft_url_host(url)) AS d FROM urls""".stripMargin).head()
    assert(row.getString(0) === "https://blog.example.co.uk/p?id=1")
    assert(row.getString(1) === "blog.example.co.uk")
    assert(row.getString(2) === "example.co.uk")
    Seq("a", "a", "a", "b", "c").toDF("t").createOrReplaceTempView("mg_t")
    val mg = spark.sql("SELECT graft_mg_topk(t, 2) FROM mg_t")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(mg.head.getString(0) === "a" && mg.head.getLong(1) >= 2L)
  }

  test("graft_winnow_fps agrees with the Scala operator") {
    import org.apache.spark.sql.functions.col
    val docs = Seq("the quick brown fox jumps over the lazy dog and friends",
      "too short").toDF("text")
    docs.createOrReplaceTempView("wfp_t")
    val sql = spark.sql(
      "SELECT graft_winnow_fps(text, 2, 3) AS f FROM wfp_t").collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1))))
    val api = docs.select(
      graft.operators.Winnow.fingerprintArray(col("text"), 2, 3).as("f"))
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1))))
    assert(sql.toSeq === api.toSeq)
    assert(sql(0).nonEmpty)
  }

  test("graft_rendezvous_shard agrees with the Scala operator") {
    import org.apache.spark.sql.functions.col
    val keys = (1 to 50).map(i => s"k$i").toDF("k")
    keys.createOrReplaceTempView("hrw_t")
    val sql = spark.sql(
      "SELECT k, graft_rendezvous_shard(k, 8) AS s FROM hrw_t ORDER BY k")
      .collect().map(r => r.getString(0) -> r.getInt(1))
    val api = keys.select(col("k"),
      graft.operators.Layout.rendezvousShard(col("k"), 8).as("s"))
      .orderBy("k").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(sql === api)
    assert(sql.map(_._2).forall(s => s >= 0 && s < 8))
  }

  test("generation-eval kernels agree with the Scala operators from SQL") {
    Seq((1L, "the cat sat on the mat", "the cat is on the mat"))
      .toDF("id", "cand", "ref").createOrReplaceTempView("gdocs")
    val r = spark.sql(
      """SELECT
        |  graft_multiset_intersect_sorted(
        |    sort_array(split(cand, ' ')), sort_array(split(ref, ' '))) AS ov,
        |  graft_multiset_clip_max_ref(
        |    sort_array(split(cand, ' ')),
        |    array(sort_array(split(ref, ' ')),
        |          sort_array(array('sat', 'sat')))) AS clip,
        |  graft_lcs_token_length(split(cand, ' '), split(ref, ' ')) AS lcs,
        |  graft_chrf_gram_overlaps('abcab', 'abcb', 3) AS chrf
        |FROM gdocs""".stripMargin).head
    // unigram multiset: the(2) cat on mat shared, sat vs is not -> 5
    assert(r.getLong(0) === 5L)
    // clip vs two refs: 'sat' now credited once via ref2 -> 6
    assert(r.getLong(1) === 6L)
    // LCS: the cat _ on the mat -> 5
    assert(r.getLong(2) === 5L)
    // chrF orders over 'abcab' vs 'abcb': k=1 -> min-counts a2b2c1=4(of 5,4)
    val chrf = r.getSeq[org.apache.spark.sql.Row](3)
    assert(chrf.map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      x.getLong(3))) === Seq((1L, 5L, 4L, 4L), (2L, 4L, 3L, 2L),
      (3L, 3L, 2L, 1L)))
  }
}
