package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine text/hash primitives for the LLM-data operators.
  *
  * Every helper exists twice: as a Spark `Column` builder and as a DuckDB
  * SQL fragment builder (suffix `Sql`) used by the oracle. The pairs are
  * kept adjacent so the bit-for-bit contract between engine and oracle is
  * reviewable side by side.
  *
  * Determinism strategy (same as [[graft.Dsl]]): keep every REDUCTION in
  * exact integer space (hashes mod a 31-bit prime, floats scaled to
  * integers), and allow floating point only in final scalar ops (a single
  * division / sqrt on exact operands is bit-identical IEEE-754 on both
  * engines). No reliance on engine hash functions (Spark murmur3 vs DuckDB
  * wyhash differ): the shared 60-bit hash is the first 15 hex digits of
  * MD5, identical everywhere.
  *
  * Scale notes (100 TB): all per-document work (tokenize, shingle, hash,
  * minhash signature, simhash) is expressed as nested higher-order
  * functions over array columns — strictly map-side, no explode, no
  * shuffle, no UDF. Data only shuffles at the LSH band join / group-by,
  * which is the intended O(candidates) exchange.
  */
object TextDsl {

  /** 2^31-1, Mersenne prime: hash values stay < 2^31 so an (a*h+b) pass
    * stays < 2^62 — no overflow on either engine (DuckDB errors on int64
    * overflow rather than wrapping, so bounds are load-bearing). */
  val P = 2147483647L

  /** English stopwords present in the fixture vocabulary — shared by the
    * language-ID heuristic (q31), quality scoring (q32), and the
    * curation pipeline (q45). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")
  def stopwordsArr: Column = array(stopwords.map(lit): _*)
  def stopwordsSql: String = stopwords.mkString("['", "','", "']")

  // -------------------------------------------------------------------
  // Tokenization: lowercase, strip non-alphanumerics, split, drop
  // empties. Engine side runs the compiled kernel (~100× the HOF chain:
  // regexp_replace + split + interpreted filter lambda per token);
  // [[tokensHof]] keeps the declarative formulation the oracle mirrors,
  // and HashKernelsSpec asserts they are identical on the fixtures.
  def tokens(c: Column): Column = graft.functions.HashFunctions.tokenize(c)

  def tokensHof(c: Column): Column =
    filter(split(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +"), t => t =!= "")

  def tokensSql(c: String): String =
    s"list_filter(regexp_split_to_array(regexp_replace(lower($c),'[^a-z0-9 ]',' ','g'),' +'), t -> t != '')"

  // -------------------------------------------------------------------
  // Shared 60-bit hash: first 15 hex digits of MD5, as a non-negative
  // BIGINT. MD5 is MD5 on every engine; 60 bits < 2^63 parses exactly.
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60Sql(c: String): String =
    s"CAST(CONCAT('0x', substr(md5($c),1,15)) AS BIGINT)"

  /** h60 reduced mod P — the working hash for minhash/fingerprints. */
  def hp(c: Column): Column = h60(c) % P
  def hpSql(c: String): String = s"(${h60Sql(c)} % $P)"

  // -------------------------------------------------------------------
  // Word n-gram shingles: ["a","b","c","d"], n=3 → ["a b c","b c d"].
  // Engine side is the compiled kernel; [[shinglesHof]] is the
  // declarative formulation the oracle mirrors (guard size<n: Spark's
  // sequence(1, 0) would count DOWN; DuckDB's range(1, 0) is empty).
  def shingles(toks: Column, n: Int): Column =
    graft.functions.HashFunctions.shingles(toks, n)

  def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  def shinglesSql(toks: String, n: Int): String =
    s"(CASE WHEN len($toks) < $n THEN CAST([] AS VARCHAR[]) " +
      s"ELSE list_transform(range(1, len($toks)-${n - 2}), i -> array_to_string(($toks)[i:i+${n - 1}],' ')) END)"

  // -------------------------------------------------------------------
  // MinHash signature of a shingle-hash array (values already mod P):
  // sig[i] = min over h of ((1 + 7919 i) h + 104729 (i+1)) mod P, i<k.
  // a_i ≤ 1+7919(k-1), so a_i*h < 2^62 for k ≤ ~10^5. Empty input → P
  // (the fold's init), which never collides with a real minhash < P.
  //
  // Shape matters: this is a SINGLE fold over `hashes` carrying a k-wide
  // accumulator, NOT transform(0..k-1, i -> aggregate(hashes, …)). The
  // latter evaluates the `hashes` child expression k times per row, and
  // after CollapseProject inlines the tokenize→shingle→md5 pipeline into
  // it, each of those k evaluations re-hashes the whole document — a
  // measured 15× wall-clock blowup. A fold evaluates its input once no
  // matter what Catalyst inlines into it.
  def minhashSig(hashes: Column, k: Int): Column =
    aggregate(hashes, array_repeat(lit(P), k),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (a, i) => least(a, ((lit(7919L) * i + 1L) * h + lit(104729L) * (i + 1L)) % P)))

  def minhashSigSql(hashes: String, k: Int): String =
    s"list_transform(range(0, $k), i -> coalesce(list_aggregate(" +
      s"list_transform($hashes, h -> ((1 + 7919*i)*h + 104729*(i+1)) % $P), 'min'), $P))"

  // -------------------------------------------------------------------
  // SimHash (60-bit) over a token-hash array (h60 values, NOT mod P —
  // we want all 60 bits): bit j set iff Σ_tokens (2·bit_j(h) − 1) > 0.
  // Built as a SQL expr string: the Scala `shiftright(col, Int)` API only
  // takes a literal shift, but the SQL expression form accepts a column
  // (the lambda index j), and hashes ≥ 0 makes `% 2` ≡ `& 1`.
  //
  // Single fold over the hash array with a 60-counter accumulator (not
  // 60 aggregates) — same reasoning as minhashSig: the input expression
  // is evaluated once per row regardless of what Catalyst inlines.
  def simhash(hashesCol: String): Column = expr(
    s"aggregate(zip_with(" +
      s"aggregate($hashesCol, array_repeat(0L, 60), (acc, h) -> " +
      s"  zip_with(acc, sequence(0, 59), (a, j) -> a + (shiftright(h, j) % 2)*2 - 1)), " +
      s"sequence(0, 59), (c, j) -> IF(c > 0, shiftleft(1L, j), 0L)), " +
      s"0L, (acc, b) -> acc + b)")

  def simhashSql(hashes: String): String =
    s"list_aggregate(list_transform(range(0, 60), j -> CASE WHEN " +
      s"list_aggregate(list_transform($hashes, h -> ((h >> j) & 1)*2 - 1), 'sum') > 0 " +
      s"THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END), 'sum')"

  // -------------------------------------------------------------------
  // Scaled-integer embedding vector: float → floor(x * 1e7) as BIGINT.
  // Dot products and norms over these are exact int64 (|x|≲16 → scaled
  // ≲1.6e8; 64-dim dot ≲ 64·(1.6e8)² ≈ 1.6e18 < 2^63).
  def scaledVec(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 10000000d).cast("long"))

  def scaledVecSql(c: String): String =
    s"list_transform($c, x -> CAST(floor(CAST(x AS DOUBLE)*10000000) AS BIGINT))"

  /** Exact int64 dot product of two scaled vectors — native codegen
    * expression (graft.functions.DotProductInt64): the pairwise kernel
    * of every similarity join must be compiled, not interpreted. */
  def dotInt(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotInt64(a, b)

  def dotIntSql(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a)+1), i -> ($a)[i]*($b)[i]), 'sum')"

  /** Exact int64 squared norm. */
  def norm2Int(a: Column): Column = dotInt(a, a)
  def norm2IntSql(a: String): String =
    s"list_aggregate(list_transform($a, x -> x*x), 'sum')"

  /** Cosine from exact integer dot/norms — one division + two sqrt on
    * identical operands ⇒ bit-identical double on both engines. */
  def cosineFromInts(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  def cosineFromIntsSql(dot: String, n2a: String, n2b: String): String =
    s"(CAST($dot AS DOUBLE) / (sqrt(CAST($n2a AS DOUBLE)) * sqrt(CAST($n2b AS DOUBLE))))"

  // -------------------------------------------------------------------
  // Hashed bag-of-words (the feature-hashing trick, Weinberger et al.
  // ICML 2009): token t contributes sign(t) ∈ {±1} at bucket
  // h60(t) % dim; the vector is the signed occurrence count per bucket.
  // Exact int64 end to end, so cosine against another hashed vector is
  // bit-identical cross-engine via [[cosineFromInts]].
  //
  // Engine side runs the compiled kernel (HashKernels.hashedBow — the
  // interpreted fold pays 2 md5 Column trees + a dim-wide zip_with per
  // token); [[hashedBowHof]] keeps the declarative formulation, and
  // HashKernelsSpec asserts they are identical on the fixtures.
  // Strictly map-side: the corpus never explodes or shuffles to build
  // vectors. The oracle mirrors via the sparse unnest→group
  // formulation; the sums are exact integers, so the formulations are
  // equal.
  def hashedBow(tk: Column, dim: Int = 16): Column =
    graft.functions.HashFunctions.hashedBow(tk, dim)

  def hashedBowHof(tkExpr: String, dim: Int = 16): Column = expr(
    s"aggregate(transform($tkExpr, t -> named_struct(" +
      s"'j', CAST(CONV(SUBSTRING(md5(t), 1, 15), 16, 10) AS BIGINT) % $dim, " +
      s"'sg', 1L - 2L * (CAST(CONV(SUBSTRING(md5(CONCAT('sgn ', t)), 1, 15), 16, 10) AS BIGINT) % 2L))), " +
      s"array_repeat(CAST(0 AS BIGINT), $dim), " +
      s"(acc, p) -> zip_with(acc, sequence(0, ${dim - 1}), " +
      s"(a, i) -> a + IF(i = p.j, p.sg, CAST(0 AS BIGINT))))")

  /** Sparse oracle mirror of [[hashedBow]]: per-occurrence (bucket,
    * sign) rows to GROUP BY — compose as
    * `FROM <toks>, unnest(tk) AS u(t)`. */
  def hashedBowOccSql(t: String): String =
    s"CAST(${h60Sql(t)} % 16 AS BIGINT) AS j, 1 - 2*(${h60Sql(s"('sgn ' || $t)")} % 2) AS sg"
}
