package graft.queries

import graft.core.Tables
import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operator pack over `documents`, each with an
  * exact DuckDB oracle. */
object TextQueries {

  val q_token_stats: QueryDef = QueryDef.sqlChecked(
    "q_token_stats",
    s"""SELECT doc_id,
       |  CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(${TextOps.tokensSql("text")})) AS BIGINT) AS n_uniq,
       |  CAST(length(text) AS BIGINT) AS n_chars_calc,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(TextOps.tokens(col("text")))).cast("long").as("n_uniq"),
        length(col("text")).cast("long").as("n_chars_calc"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))
  }

  val q_lang_guess: QueryDef = QueryDef.sqlChecked(
    "q_lang_guess",
    s"""SELECT doc_id, ${TextOps.langGuessSql("text")} AS guess,
       |  CAST(${TextOps.langGuessSql("text")} = lang AS INT) AS hit
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("guess", TextOps.langGuess(col("text")))
      .select(col("doc_id"), col("guess"),
        (col("guess") === col("lang")).cast("int").as("hit"))
      .orderBy(col("doc_id"))
  }

  val q_quality_score: QueryDef = QueryDef.sqlChecked(
    "q_quality_score",
    s"""SELECT doc_id, ${TextOps.qualitySqlColumns("text")}
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextOps.qualityColumns(Tables.documents(s, dir))
      .select("doc_id", "n_tokens", "n_uniq", "n_stop", "stop_ratio",
        "avg_token_len", "score")
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints: full md5 + 60-bit integer fingerprint. */
  val q_fingerprint: QueryDef = QueryDef.sqlChecked(
    "q_fingerprint",
    s"""SELECT doc_id, md5(text) AS fp_md5,
       |  ${TextOps.hexToLongSql("md5(text)", 15)} AS fp60
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp_md5"),
        TextOps.hexToLong(md5(col("text")), 15).as("fp60"))
      .orderBy(col("doc_id"))
  }

  /** Exact dedup by full text (keeper = min doc_id per group). */
  val q_dedup_exact: QueryDef = QueryDef.sqlChecked(
    "q_dedup_exact",
    """SELECT min(doc_id) AS keeper, count(*) AS copies, md5(text) AS h
      |FROM documents GROUP BY text ORDER BY keeper""".stripMargin) { (s, dir) =>
    Dedup.exactGroups(Tables.documents(s, dir), "text")
      .select(col("keeper"), col("copies"), md5(col("text")).as("h"))
      .orderBy(col("keeper"))
  }

  /** Near-dedup by 40-char prefix (coarse clustering variant). */
  val q_dedup_prefix: QueryDef = QueryDef.sqlChecked(
    "q_dedup_prefix",
    """SELECT substr(text, 1, 40) AS prefix, min(doc_id) AS keeper,
      |  count(*) AS copies
      |FROM documents GROUP BY substr(text, 1, 40) ORDER BY keeper""".stripMargin) { (s, dir) =>
    Dedup.exactGroups(
        Tables.documents(s, dir).withColumn("prefix", substring(col("text"), 1, 40)),
        "prefix")
      .select(col("prefix"), col("keeper"), col("copies"))
      .orderBy(col("keeper"))
  }

  /** MinHash signatures (16 hashes over word 3-gram shingles). */
  val q_minhash_sig: QueryDef = QueryDef.sqlChecked(
    "q_minhash_sig",
    Dedup.minhashSignaturesSql + "\nORDER BY doc_id") { (s, dir) =>
    Dedup.minhashSignatures(Tables.documents(s, dir)).orderBy(col("doc_id"))
  }

  /** 16-bit SimHash per doc. */
  val q_simhash: QueryDef = QueryDef.sqlChecked(
    "q_simhash",
    Dedup.simhashSql + "\nORDER BY doc_id") { (s, dir) =>
    Dedup.simhash(Tables.documents(s, dir)).orderBy(col("doc_id"))
  }

  /** Exact n-gram Jaccard for all pairs among doc_id < 40. */
  val q_ngram_jaccard: QueryDef = QueryDef.sqlChecked(
    "q_ngram_jaccard",
    s"""WITH ${TextOps.shingleCteSql},
       |d AS (SELECT DISTINCT doc_id, s FROM sh WHERE doc_id < 40),
       |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
       |  FROM d a JOIN d b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT d1, d2, n_inter,
       |  n_inter / (na.n + nb.n - n_inter) AS jaccard
       |FROM inter JOIN sz na ON na.doc_id = d1 JOIN sz nb ON nb.doc_id = d2
       |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, dir).filter(col("doc_id") < 40))
      .orderBy(col("d1"), col("d2"))
  }

  val all: Seq[QueryDef] = Seq(
    q_token_stats, q_lang_guess, q_quality_score, q_fingerprint,
    q_dedup_exact, q_dedup_prefix, q_minhash_sig, q_simhash, q_ngram_jaccard)
}
