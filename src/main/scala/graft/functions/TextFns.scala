package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text-pipeline primitives: tokenization, shingling, portable
  * 60-bit hashing, MinHash signatures, SimHash fingerprints.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition
  * (codegen'd, no UDFs — the reference defines zero UDFs either, SURVEY
  * §2.12). The hash primitive is md5-based so the exact same value is
  * computable in any engine with an md5() builtin — that is what makes the
  * dedup/similarity operators oracle-checkable bit-for-bit against DuckDB.
  *
  * Scale notes: all of these are narrow per-row expressions — no shuffle,
  * no driver traffic — so they run at full scan parallelism at any data
  * size. MinHash cost is O(numHashes × shingles) per row; at 100 TB the
  * shingling + signature pass is embarrassingly parallel and the only
  * shuffle in a dedup pipeline is the band-bucket exchange that follows.
  */
object TextFns {

  /** Whitespace tokens of a trimmed string. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Portable 60-bit hash: first 15 hex chars of md5, as a non-negative
    * long. DuckDB equivalent: `CAST(concat('0x', substr(md5(x),1,15)) AS
    * BIGINT)`. 60 bits keeps the value positive in a signed 64-bit int in
    * every engine. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Driver-side hash60 of a literal string — the exact value
    * `hash60(lit(s))` evaluates to (first 15 md5 hex chars as a long).
    * For precomputing ROW-INVARIANT hashes (e.g. per-dimension plane
    * signs) once on the driver instead of per row per executor. */
  def hash60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Production 60-bit hash: top 60 bits of xxhash64 — codegen'd and
    * ~10× cheaper than the md5 digest+hex path, same non-negative 60-bit
    * range (so every overflow-safety argument built on [[hash60]]
    * carries over). NOT cross-engine portable; the oracle-checked
    * queries stay on md5. */
  def xxhash60(c: Column): Column = shiftrightunsigned(xxhash64(c), 4)

  /** The `spark.graft.fastHash` knob: true switches the MinHash/sampling
    * hash family from portable md5 to [[xxhash60]]. Oracle-checked
    * queries ignore it (they hardcode the md5 family — flipping a conf
    * must never change a verified answer); the library facade and
    * [[graft.operators.NearDup]] honor it. */
  def fastHash(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.graft.fastHash").exists(_.toBoolean)

  /** Seeded variant: independent hash family member i (for MinHash). */
  def hash60Seeded(c: Column, seed: Column): Column =
    hash60(concat(seed.cast(StringType), lit(":"), c))

  /** Distinct word k-shingles (k consecutive tokens joined by a space).
    * Empty when the document has fewer than k tokens. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    // sequence(a, b) with b < a generates a DESCENDING range, so the
    // short-document case must be guarded, not clamped.
    when(size(toks) < k, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(
        transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** Distinct character k-grams of the raw string (document
    * fingerprinting / winnowing building block). */
  def charGrams(text: Column, k: Int): Column =
    when(length(text) < k, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), length(text) - (k - 1)),
          i => text.substr(i, lit(k)))))

  /** MinHash signature over a HASHED shingle set (array<long> from
    * [[hashedShingles]]): slot i = min over shingles of `h1 + i·h2`, the
    * Broder-style derived hash family — h1 is the shingle's 60-bit hash,
    * h2 an independent 48-bit hash of h1's decimal string. ONE extra md5
    * per shingle buys all `numHashes` functions (vs one md5 per shingle
    * per slot); h1 + i·h2 < 2^61 so the arithmetic never overflows a
    * signed 64-bit int in any engine. Docs with Jaccard J agree in ~J of
    * slots (Broder 1997). Null-safe for empty sets (slot = max long so it
    * never collides). */
  def minHash(hashedShingleSet: Column, numHashes: Int, fast: Boolean = false): Column = {
    // h2: independent 48-bit member — md5-of-decimal-string (portable) or
    // top-48 of xxhash64 (fast); both keep h1 + i·h2 < 2^61
    val h2s =
      if (fast) transform(hashedShingleSet, h => shiftrightunsigned(xxhash64(h), 16))
      else transform(hashedShingleSet,
        h => conv(substring(md5(h.cast(StringType)), 1, 12), 16, 10).cast(LongType))
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i =>
        coalesce(
          array_min(zip_with(hashedShingleSet, h2s, (h1, h2) => h1 + i * h2)),
          lit(Long.MaxValue)))
  }

  /** LSH band key: hash of signature slots [band*rows, band*rows+rows).
    * Near-dup candidates = rows sharing (band index, band key) for any
    * band. The banded self-join is the ONLY shuffle in the near-dup
    * pipeline and its key cardinality is ~numDocs×bands. */
  def bandKey(signature: Column, band: Int, rows: Int, fast: Boolean = false): Column = {
    val slots = transform(slice(signature, band * rows + 1, rows), _.cast(StringType))
    if (fast) xxhash64(concat_ws(",", slots)) else md5(concat_ws(",", slots))
  }

  /** Hashed shingle set: each shingle string → 60-bit long. Distinct runs
    * BEFORE hashing — small-vocab corpora repeat shingles heavily, so
    * deduping strings first saves ~20% of the md5 calls (measured faster
    * than the hash-then-distinct order). Set operations over longs are
    * ~5× cheaper than over strings and shrink the shuffled candidate
    * rows; with 60-bit hashes the collision probability is negligible,
    * and the DuckDB oracle applies the identical hash so results agree
    * bit-for-bit even if one occurred. */
  def hashedShingles(text: Column, k: Int, fast: Boolean = false): Column =
    transform(wordShingles(text, k),
      s => if (fast) xxhash60(s) else hash60(s))

  /** Jaccard similarity from precomputed intersect + set sizes. Integer
    * inputs → the double division is bit-deterministic. */
  def jaccardFromSizes(inter: Column, na: Column, nb: Column): Column =
    inter.cast(DoubleType) / (na + nb - inter).cast(DoubleType)

  /** Exact Jaccard similarity of two shingle-set columns, as double. */
  def jaccard(a: Column, b: Column): Column =
    jaccardFromSizes(size(array_intersect(a, b)), size(a), size(b))

  /** 32-bit SimHash fingerprint over a token array (Charikar 2002): each
    * token votes +1/-1 per bit position by its hash60 bit; fingerprint bit
    * j is set iff the vote total is positive. Returns a long (low 32 bits
    * used). Near-dup docs differ in few bits → Hamming distance via
    * `bit_count(a ^ b)`. */
  def simHash(toks: Column): Column = simHashW(toks, 32)

  /** SimHash fingerprint over the low `bits` bits (≤ 60: every bit must
    * come from the portable [[hash60]] so DuckDB reproduces it). Wider
    * fingerprints separate random docs further (expected distance bits/2),
    * which is what makes a TIGHT Hamming threshold + selective banding
    * possible — the 100 TB configuration is 60 bits / threshold ≤ 3. */
  def simHashW(toks: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 60, s"simhash width must be in [1,60], got $bits")
    // shiftright/shiftleft helpers only accept literal bit counts; the SQL
    // functions accept column bit counts, reached via call_function.
    def shr(v: Column, bc: Column) = call_function("shiftright", v, bc)
    def shl(v: Column, bc: Column) = call_function("shiftleft", v, bc)
    val hashes = transform(toks, t => hash60(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), bits),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(bits - 1)),
          (a, j) => a + when(shr(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)),
        (v, j) => when(v > 0, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)
  }

  /** Hamming distance between two long fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
