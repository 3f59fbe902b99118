package graft.queries

import org.apache.spark.sql.functions._

import graft.Exact._
import graft.functions.GraftFunctions
import graft.operators.{Bpe, TextOps}
import graft.sources.Tables

/** Fiftieth coverage wave: NON-CANONICAL RIFF layouts through the
  * bounded chunk walk — the r6 verdict's one named gap (real corpora
  * contain LIST-first WAVs routinely; treating them as unparseable was
  * a false NULL).
  *
  * q186 synthesizes a WAV per document in one of THREE spec-valid
  * layouts chosen by the payload hash — canonical fmt-first, one LIST
  * metadata chunk before fmt, or LIST + odd-sized JUNK (exercising the
  * RIFF word-alignment pad byte) before fmt — and decodes the fmt
  * fields with the `wav_*` expressions, which now locate the chunk by
  * walking size-prefixed chunk headers (functions/MediaHeader.scala
  * `WavFmtField`, budget 8). The corrupt slice (~10%: 'R' → 'Q') still
  * decodes to NULL on both engines. The ORACLE does not walk: it
  * synthesizes the same bytes and reads the fmt fields at the
  * per-layout offsets it KNOWS it placed them at — so a walk that
  * lands anywhere else hash-fails. Scale shape: pure per-row map over
  * a pruned 2-column scan, no shuffle before the (tiny) result.
  *
  * Reference tie-in: the byte-decode capability class of
  * /root/reference/src/main.rs:46-62, done for a real container's
  * variable-layout form.
  */
object Extras50 {

  val all: Seq[Qry] = Seq(

    Qry(
      "q186_wav_chunked", {
        // little-endian u16/u32 as hex — low byte first, per RIFF
        def le16(x: String) =
          s"printf('%02x', ($x) % 256) || printf('%02x', ($x) // 256)"
        def le32(x: String) =
          s"printf('%02x', ($x) % 256) || printf('%02x', (($x) // 256) % 256)" +
            s" || printf('%02x', (($x) // 65536) % 256)" +
            s" || printf('%02x', (($x) // 16777216) % 256)"
        // pre-fmt chunk bytes per layout: LIST(10-byte payload) = 18,
        // JUNK(7-byte payload + pad) = 16
        val fo = "20 + CASE WHEN layout >= 1 THEN 18 ELSE 0 END" +
          " + CASE WHEN layout = 2 THEN 16 ELSE 0 END"
        val magic = "substr(hx, 1, 8) = '52494646'" +
          " AND substr(hx, 17, 8) = '57415645'"
        // LE reads at a COMPUTED byte offset o (0-based): hex position
        // of byte k is 2k+1
        def u16(o: String) =
          s"CAST(('0x' || substr(hx, 2*($o)+3, 2)" +
            s" || substr(hx, 2*($o)+1, 2)) AS INTEGER)"
        def u32(o: String) =
          s"CAST(('0x' || substr(hx, 2*($o)+7, 2) || substr(hx, 2*($o)+5, 2)" +
            s" || substr(hx, 2*($o)+3, 2) || substr(hx, 2*($o)+1, 2))" +
            " AS INTEGER)"
        def guard(v: String) = s"CASE WHEN $magic THEN $v ELSE NULL END"
        s"""WITH d AS (SELECT doc_id,
           |    CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60
           |  FROM documents),
           |p AS (SELECT doc_id,
           |    h60 % 3 AS layout,
           |    CASE (h60 // 3) % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
           |      WHEN 2 THEN 6 ELSE 8 END AS nch,
           |    CASE (h60 // 12) % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
           |      WHEN 2 THEN 22050 WHEN 3 THEN 44100
           |      WHEN 4 THEN 48000 ELSE 96000 END AS rate,
           |    CASE (h60 // 72) % 4 WHEN 0 THEN 8 WHEN 1 THEN 16
           |      WHEN 2 THEN 24 ELSE 32 END AS bits,
           |    (h60 % 10 = 0) AS corrupt
           |  FROM d),
           |b AS (SELECT doc_id, layout, unhex(
           |    (CASE WHEN corrupt THEN '51' ELSE '52' END) || '494646'
           |    || ${le32("28 + CASE WHEN layout >= 1 THEN 18 ELSE 0 END" +
                " + CASE WHEN layout = 2 THEN 16 ELSE 0 END")}
           |    || '57415645'
           |    || (CASE WHEN layout >= 1
           |      THEN '4C4953540A000000494E464F6A756E6B6A6B' ELSE '' END)
           |    || (CASE WHEN layout = 2
           |      THEN '4A554E4B070000006A756E6B6A6E6B00' ELSE '' END)
           |    || '666D7420' || ${le32("16")} || ${le16("1")}
           |    || ${le16("nch")} || ${le32("rate")}
           |    || ${le32("rate * nch * (bits // 8)")}
           |    || ${le16("nch * (bits // 8)")} || ${le16("bits")}) AS blob
           |  FROM p),
           |x AS (SELECT doc_id, layout, hex(blob) AS hx FROM b)
           |SELECT doc_id AS media_id, CAST(layout AS INTEGER) AS layout,
           |  ${guard(u16(fo))} AS audio_fmt,
           |  ${guard(u16(s"($fo) + 2"))} AS channels,
           |  ${guard(u32(s"($fo) + 4"))} AS sample_rate,
           |  ${guard(u32(s"($fo) + 8"))} AS byte_rate,
           |  ${guard(u16(s"($fo) + 14"))} AS bits
           |FROM x""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      GraftFunctions.register(spark)
      def le16(x: String) = concat(
        expr(s"le_encode_u8(CAST(($x) % 256 AS INT))"),
        expr(s"le_encode_u8(CAST(($x) DIV 256 AS INT))"))
      def ascii(s: String) = lit(s.getBytes("US-ASCII"))
      val listChunk = concat(ascii("LIST"), expr("le_encode_u32(10)"),
        ascii("INFOjunkjk"))
      // 7-byte payload -> one pad byte (RIFF word alignment)
      val junkChunk = concat(ascii("JUNK"), expr("le_encode_u32(7)"),
        ascii("junkjnk"), expr("le_encode_u8(0)"))
      Tables(spark, dir).documents
        .select($"doc_id",
          expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)")
            .as("h60"))
        .withColumn("layout", expr("CAST(h60 % 3 AS INT)"))
        .withColumn("nch", element_at(
          array(Seq(1, 2, 6, 8).map(lit): _*),
          expr("CAST((h60 DIV 3) % 4 AS INT)") + 1))
        .withColumn("rate", element_at(
          array(Seq(8000, 16000, 22050, 44100, 48000, 96000).map(lit): _*),
          expr("CAST((h60 DIV 12) % 6 AS INT)") + 1))
        .withColumn("bits", element_at(
          array(Seq(8, 16, 24, 32).map(lit): _*),
          expr("CAST((h60 DIV 72) % 4 AS INT)") + 1))
        .withColumn("blob", concat(
          expr("le_encode_u8(CASE WHEN h60 % 10 = 0 THEN 81 ELSE 82 END)"),
          ascii("IFF"),
          expr("le_encode_u32(28 + CASE WHEN layout >= 1 THEN 18 ELSE 0 END" +
            " + CASE WHEN layout = 2 THEN 16 ELSE 0 END)"),
          ascii("WAVE"),
          when($"layout" >= 1, listChunk).otherwise(lit(Array.empty[Byte])),
          when($"layout" === 2, junkChunk).otherwise(lit(Array.empty[Byte])),
          ascii("fmt "), expr("le_encode_u32(16)"),
          le16("1"), le16("nch"),
          expr("le_encode_u32(rate)"),
          expr("le_encode_u32(rate * nch * (bits DIV 8))"),
          le16("nch * (bits DIV 8)"), le16("bits")))
        .select($"doc_id".as("media_id"), $"layout",
          expr("wav_audio_format(blob)").as("audio_fmt"),
          expr("wav_channels(blob)").as("channels"),
          expr("wav_sample_rate(blob)").as("sample_rate"),
          expr("wav_byte_rate(blob)").as("byte_rate"),
          expr("wav_bits_per_sample(blob)").as("bits"))
    },

    // ---- trained-BPE end-to-end -----------------------------------------
    // Closes the r6 verdict's last tokenizer gap: `Bpe.trainMerges` was
    // spec-only (sequential-reference BpeSpec); q162 oracled one merge
    // step and q182 a FIXED artifact. Here the query TRAINS K=3 merges on
    // the corpus (driver holds only the 3-row merge table — the actual
    // merges.txt product) and encodes the corpus with them; the DuckDB
    // oracle derives the SAME 3 merges from scratch — three unrolled
    // rounds of (pair-count over the word-frequency table with
    // per-position multiplicity → top-1 by (n DESC, a, b) → fixpoint
    // leftmost-nonoverlap replace, one recursive CTE per round) — and
    // applies them with q182's recursive encode. A single diverging
    // merge reshapes n_bpe corpus-wide, so the hash match verifies the
    // trainer end-to-end, not just the application. Fixpoint replace
    // equals the greedy fold only for non-self-pair merges (the q182
    // precondition, documented at Extras47.EncMerges); a trained
    // artifact CAN contain self-pairs on repetitive corpora, so the
    // builder asserts the precondition on the ARTIFACT and fails
    // loudly rather than hash-diverging silently.
    Qry(
      "q187_bpe_train_encode", {
        def round(k: Int, prev: String) =
          s"""p$k AS (SELECT pr.a AS a, pr.b AS b, SUM(f) AS n FROM (
             |    SELECT unnest(list_transform(range(1, len(sy)),
             |        j -> {'a': sy[j], 'b': sy[j+1]})) AS pr, f
             |    FROM (SELECT str_split(trim(s, '|'), '|') AS sy, f
             |          FROM $prev))
             |  GROUP BY 1, 2),
             |t$k AS (SELECT '|' || a || '|' || b || '|' AS pat,
             |    '|' || a || b || '|' AS rep
             |  FROM p$k ORDER BY n DESC, a, b LIMIT 1),
             |r$k AS (SELECT s, f, FALSE AS done FROM $prev
             |  UNION ALL
             |  SELECT replace(s, pat, rep) AS s, f,
             |    replace(s, pat, rep) = s AS done
             |  FROM r$k, t$k WHERE NOT done),
             |w$k AS (SELECT s, f FROM r$k WHERE done)""".stripMargin
        s"""WITH RECURSIVE ${TextOps.oracleToksCte},
           |words AS (SELECT w, COUNT(*) AS f
           |  FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w),
           |w0 AS (SELECT '|' || regexp_replace(w, '(.)', '\\1|', 'g') AS s, f
           |  FROM words),
           |${round(1, "w0")},
           |${round(2, "w1")},
           |${round(3, "w2")},
           |pats AS (SELECT 1 AS i, pat, rep FROM t1
           |  UNION ALL SELECT 2, pat, rep FROM t2
           |  UNION ALL SELECT 3, pat, rep FROM t3),
           |base AS (SELECT doc_id,
           |    CAST(len(tk) AS BIGINT) AS n_words,
           |    CAST(length(array_to_string(tk, '')) AS BIGINT) AS n_chars,
           |    COALESCE(list_aggregate(list_transform(tk,
           |      w -> '|' || regexp_replace(w, '(.)', '\\1|', 'g')),
           |      'string_agg', ''), '') AS s
           |  FROM toks WHERE len(tk) > 0),
           |enc AS (
           |  SELECT doc_id, s, 1 AS i FROM base
           |  UNION ALL
           |  SELECT e.doc_id, replace(e.s, p.pat, p.rep) AS s,
           |    CASE WHEN replace(e.s, p.pat, p.rep) = e.s
           |      THEN e.i + 1 ELSE e.i END AS i
           |  FROM enc e JOIN pats p ON p.i = e.i
           |  WHERE e.i <= 3),
           |fin AS (SELECT doc_id,
           |    CAST(length(s) - length(replace(s, '|', '')) AS BIGINT)
           |      AS pipes
           |  FROM enc WHERE i = 4)
           |SELECT b.doc_id, b.n_words, b.n_chars,
           |  fin.pipes - b.n_words AS n_bpe,
           |  CASE WHEN fin.pipes - b.n_words > 0
           |    THEN round(CAST(b.n_chars AS DOUBLE)
           |      / (fin.pipes - b.n_words), 6) END AS compression
           |FROM base b JOIN fin USING (doc_id)""".stripMargin
      }) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables(spark, dir).documents
      val trained = Bpe.trainMerges(docs, "text", 3)
      require(trained.size == 3,
        s"corpus trained only ${trained.size} of 3 merges")
      val merges = trained.map(m => (m.left, m.right))
      require(merges.forall { case (a, b) => a != b },
        "trained artifact contains a self-pair merge — the oracle's " +
          "fixpoint-replace formulation diverges from the greedy fold " +
          "on such merges (Extras47 precondition); fail loudly")
      Bpe.encodedCounts(docs, "doc_id", "text", merges)
        .select($"doc_id", $"n_words", $"n_chars", $"n_bpe",
          round($"compression", 6).as("compression"))
    },

    // ---- Avro round-trip ------------------------------------------------
    // The one mainstream interchange format q183/q184 left out. The
    // spark-avro CONNECTOR jar (which registers the "avro" shortName) is
    // not in /opt/spark/jars, but Spark 4.1's spark-sql jar ships the
    // complete avro FileFormat/serializer/deserializer stack
    // (org.apache.spark.sql.avro.*) — only the
    // META-INF DataSourceRegister entry is missing, so the format is
    // addressed by its full class name. Unlike CSV/JSON, Avro is a
    // BINARY format with the writer's schema embedded: doubles and
    // timestamps survive bit-exact without the shortest-roundtrip
    // rendering discipline the text formats needed. Same proof shape as
    // q183: write a typed projection, read it back, aggregate; the
    // oracle aggregates the original parquet, so the hash match proves
    // bit-for-bit fidelity through the format.
    Qry(
      "q188_avro_roundtrip",
      s"""SELECT p_brand, COUNT(*) AS n,
         |  CAST(SUM(p_size) AS BIGINT) AS size_sum,
         |  ${dsumSql("p_retailprice")} AS price_sum,
         |  MIN(p_partkey) AS first_part,
         |  MAX(p_partkey) AS last_part
         |FROM part WHERE p_size % 3 = 0
         |GROUP BY 1""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
      val out = RoundTrip.dir(s"$dir#avro")
      val src = Tables(spark, dir).part
        .filter($"p_size" % 3 === 0)
        .select($"p_partkey", $"p_brand", $"p_size", $"p_retailprice")
      src.write.mode("overwrite").format(avroFmt).save(out)
      spark.read.format(avroFmt).schema(src.schema).load(out)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"),
          sum($"p_size").as("size_sum"),
          dsum($"p_retailprice").as("price_sum"),
          min($"p_partkey").as("first_part"),
          max($"p_partkey").as("last_part"))
    }
  )
}
