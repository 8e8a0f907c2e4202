"""Generators for DuckDB oracle SQL that exactly recomputes the
engine's hash-based operators (simhash, fingerprints, splitmix-derived
synthetic columns) in pure ANSI-ish SQL.

The engine's kernels work in wrapping uint64 arithmetic; DuckDB has no
wrapping ops, so every +/* is emulated in HUGEINT with explicit
``% 2^64`` reductions, and 64×64→64 wrapping multiplication is split
into 32-bit halves (al·bl + ((al·bh + ah·bl) mod 2^32)·2^32 mod 2^64 —
all intermediates < 2^66 « 2^127). xor/shift/popcount run on UBIGINT
(DuckDB ``xor``, ``>>``, ``bit_count``).

These oracles intentionally recompute the SAME algorithm from its
mathematical definition — the point of the gate is that the Ray
pipeline (shuffles, banding, group merges) reproduces the per-row math
end-to-end, which a row-at-a-time SQL recomputation checks exactly.
ASCII corpora only: SQL ``substr``/``ascii`` are codepoint-based while
the engine shingles UTF-8 bytes (identical on ASCII; the testdata is
ASCII).
"""

from __future__ import annotations

M64 = 1 << 64
_SPLITMIX_C0 = 0x9E3779B97F4A7C15
_SPLITMIX_C1 = 0xBF58476D1CE4E5B9
_SPLITMIX_C2 = 0x94D049BB133111EB
POLY_P = 1099511628211


def wmul(a_expr: str, b_const: int) -> str:
    """SQL for (a * b) mod 2^64 with ``a_expr`` a HUGEINT in [0, 2^64)."""
    bl, bh = b_const & 0xFFFFFFFF, b_const >> 32
    return (
        f"((({a_expr}) % 4294967296) * {bl} + "
        f"(((({a_expr}) % 4294967296) * {bh} + "
        f"(({a_expr}) // 4294967296) * {bl}) % 4294967296) * 4294967296"
        f") % {M64}"
    )


def xorshift(z_expr: str, shift: int) -> str:
    """SQL for z ^ (z >> shift) with z a HUGEINT in [0, 2^64) → HUGEINT."""
    return (
        f"CAST(xor(CAST(({z_expr}) AS UBIGINT), "
        f"CAST(({z_expr}) AS UBIGINT) >> {shift}) AS HUGEINT)"
    )


def splitmix_cte_steps(src_cte: str, x_col: str, out_col: str,
                       carry: str, prefix: str) -> tuple[str, str]:
    """Chained CTEs computing splitmix64(x_col) from ``src_cte``.

    Returns (cte_sql_fragment, final_cte_name); ``carry`` is the
    comma-joined list of columns to keep alongside."""
    c = f"{carry}, " if carry else ""
    p = prefix
    sql = f"""
{p}1 AS (SELECT {c}(CAST({x_col} AS HUGEINT) + {_SPLITMIX_C0}) % {M64} AS z FROM {src_cte}),
{p}2 AS (SELECT {c}{xorshift('z', 30)} AS z FROM {p}1),
{p}3 AS (SELECT {c}{wmul('z', _SPLITMIX_C1)} AS z FROM {p}2),
{p}4 AS (SELECT {c}{xorshift('z', 27)} AS z FROM {p}3),
{p}5 AS (SELECT {c}{wmul('z', _SPLITMIX_C2)} AS z FROM {p}4),
{p}6 AS (SELECT {c}CAST({xorshift('z', 31)} AS HUGEINT) AS {out_col} FROM {p}5)"""
    return sql, f"{p}6"


def _poly_powers(k: int) -> list[int]:
    return [pow(POLY_P, k - 1 - i, M64) for i in range(k)]


def shingle_hash_expr(text_col: str, pos_col: str, k: int = 5) -> str:
    """SQL: rolling poly hash of the k-byte shingle at 1-based ``pos``
    (Σ byte_i · P^(k-1-i) mod 2^64) — matches _char_shingle_hashes
    before the splitmix mix."""
    pows = _poly_powers(k)
    terms = " + ".join(
        f"CAST(ascii(substr({text_col}, {pos_col}+{i}, 1)) AS HUGEINT) * {pows[i]}"
        for i in range(k)
    )
    return f"(({terms}) % {M64})"


def simhash_pairs_sql(max_dist: int = 3, k: int = 5,
                      table: str = "documents") -> str:
    """Exact SQL recomputation of simhash_candidates(max_dist): all doc
    pairs (a < b) whose 64-bit simhash hamming distance ≤ max_dist.

    Recall of the engine's 4×16-bit banding is exact for max_dist ≤ 3
    (pigeonhole), so the band structure needs no SQL mirror."""
    smx, final = splitmix_cte_steps("wh", "wh", "mx", "doc_id, n_sh", "sm")
    return f"""
WITH sh AS (
  SELECT doc_id, length(text) - {k - 1} AS n_sh, text,
         unnest(range(1, greatest(length(text) - {k - 2}, 1))) AS p
  FROM {table}
),
wh AS (
  SELECT doc_id, n_sh, {shingle_hash_expr('text', 'p', k)} AS wh FROM sh
),{smx},
bits AS (
  SELECT doc_id, n_sh, b.bit,
         sum(CAST((mx // CAST(pow(2, b.bit) AS HUGEINT)) % 2 AS BIGINT)) AS ones
  FROM {final} CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
  GROUP BY doc_id, n_sh, b.bit
),
simsraw AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN ones * 2 > n_sh
                       THEN CAST(pow(2, bit) AS HUGEINT)
                       ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS sim
  FROM bits GROUP BY doc_id
),
sims AS (
  SELECT d.doc_id, coalesce(s.sim, CAST(0 AS UBIGINT)) AS sim
  FROM {table} d LEFT JOIN simsraw s USING (doc_id)
)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.sim, y.sim)) AS BIGINT) AS dist
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.sim, y.sim)) <= {max_dist}
"""


def _splitmix_chain(
    salts: list[tuple[str, int]], src: str = "base", i_col: str = "i"
) -> tuple[str, str, list[str]]:
    """Chained CTEs computing ``out = splitmix64(i ^ salt)`` for every
    (out_name, salt), carrying previous outputs along. Returns
    (cte_fragment, final_cte, output column names)."""
    frags: list[str] = []
    carry = [i_col]
    prev = src
    for name, salt in salts:
        xin = f"{name}_in"
        carry_sql = ", ".join(carry)
        frags.append(
            f"""
{xin} AS (SELECT {carry_sql},
  CAST(xor(CAST({i_col} AS UBIGINT), CAST({salt} AS UBIGINT)) AS HUGEINT) AS x
  FROM {prev})"""
        )
        sm, final = splitmix_cte_steps(xin, "x", name, carry_sql, f"sm_{name}")
        frags.append(sm)
        carry = carry + [name]
        prev = final
    return ",".join(frags), prev, carry


def flagship_rollup_sql(
    table: str = "documents",
    t0: int = 1_700_000_000_000_000,
    step: int = 50_000,
    now: int = 1_700_100_000_000_000,
    tier: int = 60_000_000,
    labels_prefix: str = "env=prod,",
) -> str:
    """Exact SQL recomputation of the FLAGSHIP pipeline over the
    synthetic sequence table derived from ``documents.doc_id``:
    splitmix64-derived n_tok/source/ts-missing/bad-value/jitter+shard
    (stages/derive.py + sources/tokens.py rules), the NaN/Inf drop, the
    env=prod relabel prepend, series_key composition, and the gap-filled
    1m rollup with ``last`` = value at max (ts, order)."""
    chain, final, _ = _splitmix_chain(
        [
            ("ntok_h", 0x5EED_0001),
            ("src_h", 0x5EED_0002),
            ("tsn_h", 0x7A57_0001),
            ("val_h", 0x7A57_0002),
            ("jit_h", 0x7A57_0003),
        ]
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
derived AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok,
         CAST(src_h % 100 AS BIGINT) AS pct,
         (tsn_h % 50 = 0) AS ts_missing,
         (val_h % 200 = 0) AS bad,
         CAST(jit_h % 1000 AS BIGINT) AS jitter_ms,
         CAST(jit_h % 16 AS BIGINT) AS shard
  FROM {final}),
pts AS (
  SELECT CASE WHEN pct < 70 THEN 'web' WHEN pct < 85 THEN 'books'
              WHEN pct < 95 THEN 'code' ELSE 'wiki' END AS src,
         CASE WHEN ts_missing THEN {now}
              ELSE {t0} + ord * {step} + jitter_ms * 1000 END AS ts,
         CAST(n_tok AS DOUBLE) AS v, ord, shard
  FROM derived WHERE NOT bad),
keyed AS (
  SELECT 'seq.' || src || '.ntok{{{labels_prefix}source=' || src ||
         ',shard=' || shard || '}}' AS series_key, ts, v, ord
  FROM pts),
w AS (
  SELECT series_key, ts - (ts % {tier}) AS window_start, v,
         row_number() OVER (
           PARTITION BY series_key, ts - (ts % {tier})
           ORDER BY ts DESC, ord DESC) AS rn
  FROM keyed),
agg AS (
  SELECT series_key, window_start,
         min(v) AS vmin, max(v) AS vmax, sum(v) AS vsum,
         count(*) AS n, max(CASE WHEN rn = 1 THEN v END) AS last
  FROM w GROUP BY 1, 2),
bounds AS (SELECT series_key, min(window_start) lo, max(window_start) hi
           FROM agg GROUP BY 1),
dense AS (
  SELECT b.series_key,
         unnest(generate_series(b.lo, b.hi, {tier})) AS window_start
  FROM bounds b)
SELECT d.series_key, d.window_start, a.vmin, a.vmax, a.vsum,
       coalesce(a.n, 0) AS n, a.last
FROM dense d LEFT JOIN agg a
  ON d.series_key = a.series_key AND d.window_start = a.window_start
"""


def fingerprint_sql(table: str = "documents") -> str:
    """Exact SQL for the whole-text polynomial rolling hash
    fingerprint (Σ byte_i · P^(len-1-i) mod 2^64): Horner's rule as a
    recursive CTE (h ← h·P + byte per position), wrapping multiply in
    HUGEINT. uint64 → the engine's int64 view at the end."""
    step = wmul("acc", POLY_P)
    return f"""
WITH RECURSIVE horner(doc_id, j, len, acc) AS (
  SELECT doc_id, 0, length(text), CAST(0 AS HUGEINT) FROM {table}
  UNION ALL
  SELECT h.doc_id, h.j + 1, h.len,
         CAST((({step}) + ascii(substr(d.text, h.j + 1, 1))) % {M64}
              AS HUGEINT)
  FROM horner h JOIN {table} d USING (doc_id)
  WHERE h.j < h.len)
SELECT doc_id,
       CAST(CASE WHEN acc >= {1 << 63} THEN acc - {M64} ELSE acc END
            AS BIGINT) AS fingerprint
FROM horner WHERE j = len
"""


def lang_id_sql(table: str = "documents") -> str:
    """Exact SQL for the LangId stopword-profile guesser: lowercase,
    split on [^a-z]+, per-language lexicon hit counts, argmax over
    langs in sorted order (first max wins, = np.argmax), 'und' when no
    words or zero best score. Scores are hits/total with a shared
    denominator, so comparing raw counts is equivalent."""
    profiles = {
        "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
        "fr": ["le", "la", "les", "de", "des", "et", "est", "que", "une", "pour"],
        "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
        "es": ["el", "la", "los", "de", "y", "es", "que", "una", "por", "con"],
    }
    langs = sorted(profiles)  # np.argmax tie-break order
    hit_cols = ",\n         ".join(
        "sum(CASE WHEN w IN ({}) THEN 1 ELSE 0 END) AS {}".format(
            ", ".join(f"'{x}'" for x in profiles[lang]), lang
        )
        for lang in langs
    )
    # argmax with first-max-wins over sorted langs: lang_k wins iff its
    # count >= every later lang's count and > every... no — np.argmax
    # returns the FIRST index attaining the max, so lang_k wins iff
    # count_k >= count_j for all j > k and count_k > count_j is not
    # required for earlier j (earlier j must be strictly smaller).
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"{lang} >= {lj}" for lj in langs[i + 1:]]
        conds += [f"{lang} > {lj}" for lj in langs[:i]]
        cases.append(
            "WHEN {} THEN '{}'".format(" AND ".join(conds) or "TRUE", lang)
        )
    case_sql = "\n           ".join(cases)
    greatest = ", ".join(langs)
    return f"""
WITH words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z]+')) AS w
  FROM {table}),
vw AS (SELECT doc_id, w FROM words WHERE w <> ''),
scores AS (
  SELECT doc_id, count(*) AS total,
         {hit_cols}
  FROM vw GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN s.doc_id IS NULL OR s.total = 0
                 OR greatest({greatest}) = 0 THEN 'und'
           {case_sql}
       END AS lang_pred
FROM {table} d LEFT JOIN scores s USING (doc_id)
"""


def multimodal_decode_sql(n: int = 512, payload_bytes: int = 4096,
                          w: int = 32, h: int = 32) -> str:
    """Exact SQL for BOTH decode routes' stats: each arm's pixel bytes
    are sha256(str(media_id)) repeated to w·h (the fake codec reads
    them raw; the ppm arm wraps the same bytes in a real binary PGM
    the hand parser decodes), so per-route integer pixel sums are the
    same digest-byte sums scaled by the repetition count."""
    reps = (w * h) // 32
    assert (w * h) % 32 == 0
    per_route = f"""
WITH m AS (SELECT unnest(range(0, {n})) AS media_id),
hx AS (SELECT media_id, sha256(CAST(media_id AS VARCHAR)) AS hh FROM m),
b AS (SELECT media_id, hh, unnest(range(0, 32)) AS k FROM hx),
vals AS (
  SELECT media_id,
         (strpos('0123456789abcdef', substr(hh, 2*k + 1, 1)) - 1) * 16 +
         (strpos('0123456789abcdef', substr(hh, 2*k + 2, 1)) - 1) AS byte
  FROM b)
SELECT media_id,
       CAST({reps} * sum(byte) AS BIGINT) AS px_sum,
       CAST({reps} * sum(byte * byte) AS BIGINT) AS px_sqsum,
       CAST({w * h} AS BIGINT) AS n_px
FROM vals GROUP BY media_id
"""
    return "\nUNION ALL\n".join(
        f"SELECT '{route}' AS route, * FROM ({per_route})"
        for route in ("fake", "ppm")
    )


def tokens_payload_sql(table: str = "documents", vocab: int = 50257) -> str:
    """Exact SQL for the token PAYLOAD invariant: regenerate every
    token of every surviving sequence row from first principles —
    token[j] = splitmix64((i<<20) ^ j) % vocab, rows with a synthetic
    bad value dropped (derive rule). Output (ord, pos, token) unnested.
    """
    chain, final, _ = _splitmix_chain(
        [("ntok_h", 0x5EED_0001), ("val_h", 0x7A57_0002)]
    )
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, pos", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
surviving AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final} WHERE NOT (val_h % 200 = 0)),
positions0 AS (
  SELECT ord, unnest(range(0, n_tok)) AS pos FROM surviving),
positions AS (
  SELECT ord, pos,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain}
SELECT ord, pos, CAST(tok_h % {vocab} AS BIGINT) AS token FROM {tok_final}
"""


def token_histogram_sql(table: str = "documents", vocab: int = 50257) -> str:
    """Exact SQL for the token vocabulary histogram: regenerate every
    token of every derived sequence row (token[j] =
    splitmix64((i<<20) ^ j) % vocab — no drop rule: the histogram runs
    over the raw sequence table) and count occurrences per token."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
seqs AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final}),
positions0 AS (
  SELECT ord, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain}
SELECT CAST(tok_h % {vocab} AS BIGINT) AS token,
       CAST(count(*) AS BIGINT) AS n
FROM {tok_final} GROUP BY 1
"""


def dedup_tokens_sql(table: str = "documents", vocab: int = 50257) -> str:
    """Exact SQL for token-array exact dedup: regenerate every row's
    token list from its PLANTED source id (rows with ord % 7 = 3 take
    the tokens of ord-3 — real duplicate arrays), then group by the
    list itself: min(ord) + count per distinct sequence. The engine
    groups by a 128-bit content hash; the oracle groups by the actual
    list, so a hash that ever collided or missed order would fail."""
    n_chain, n_final = splitmix_cte_steps("nin", "x", "ntok_h", "ord, i", "smn")
    t_chain, t_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, pos", "smt"
    )
    return f"""
WITH planted AS (
  SELECT CAST(doc_id AS BIGINT) AS ord,
         CAST(doc_id - CASE WHEN doc_id % 7 = 3 THEN 3 ELSE 0 END
              AS HUGEINT) AS i
  FROM {table}),
nin AS (
  SELECT ord, i,
         CAST(xor(CAST(i AS UBIGINT), CAST({0x5EED_0001} AS UBIGINT))
              AS HUGEINT) AS x
  FROM planted),{n_chain},
seqs AS (
  SELECT ord, i, CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {n_final}),
positions0 AS (
  SELECT ord, i, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord, pos,
         CAST(xor(CAST(i AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),{t_chain},
per_doc AS (
  SELECT ord, list(CAST(tok_h % {vocab} AS BIGINT) ORDER BY pos) AS toks
  FROM {t_final} GROUP BY ord)
SELECT min(ord) AS id, CAST(count(*) AS BIGINT) AS n
FROM per_doc GROUP BY toks
"""


def truncate_tokens_sql(
    table: str = "documents", vocab: int = 50257,
    min_len: int = 32, max_len: int = 256,
) -> str:
    """Exact SQL for the context-length filter + truncation gate:
    regenerate every token of every derived sequence with
    n_tok ≥ min_len, keeping only positions < max_len — must equal the
    engine's list_slice output token for token."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, pos", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
kept AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final} WHERE 16 + (ntok_h % 497) >= {min_len}),
positions0 AS (
  SELECT ord, unnest(range(0, least(n_tok, {max_len}))) AS pos FROM kept),
positions AS (
  SELECT ord, pos,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain}
SELECT ord, pos, CAST(tok_h % {vocab} AS BIGINT) AS token FROM {tok_final}
"""


def doc_frequency_sql(table: str = "documents", vocab: int = 50257) -> str:
    """Exact SQL for the document-frequency (IDF) table: regenerate
    every token, count DISTINCT sequences per token."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
seqs AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final}),
positions0 AS (
  SELECT ord, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain}
SELECT CAST(tok_h % {vocab} AS BIGINT) AS token,
       CAST(count(DISTINCT ord) AS BIGINT) AS n_docs
FROM {tok_final} GROUP BY 1
"""


def bigram_topk_sql(
    table: str = "documents", vocab: int = 50257, k: int = 20
) -> str:
    """Exact SQL for the top-k token-bigram gate: regenerate every
    row's tokens from its PLANTED source id (ord % 7 = 3 takes ord-3's
    tokens, so duplicated arrays give real count≥2 bigrams), count
    adjacent pairs via lead(), rank by (count DESC, pair ASC)."""
    n_chain, n_final = splitmix_cte_steps("nin", "x", "ntok_h", "ord, i", "smn")
    t_chain, t_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, pos", "smt"
    )
    return f"""
WITH planted AS (
  SELECT CAST(doc_id AS BIGINT) AS ord,
         CAST(doc_id - CASE WHEN doc_id % 7 = 3 THEN 3 ELSE 0 END
              AS HUGEINT) AS i
  FROM {table}),
nin AS (
  SELECT ord, i,
         CAST(xor(CAST(i AS UBIGINT), CAST({0x5EED_0001} AS UBIGINT))
              AS HUGEINT) AS x
  FROM planted),{n_chain},
seqs AS (
  SELECT ord, i, CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {n_final}),
positions0 AS (
  SELECT ord, i, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord, pos,
         CAST(xor(CAST(i AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),{t_chain},
toks AS (
  SELECT ord, pos, CAST(tok_h % {vocab} AS BIGINT) AS token
  FROM {t_final}),
pairs AS (
  SELECT token AS a,
         lead(token) OVER (PARTITION BY ord ORDER BY pos) AS b
  FROM toks),
cnt AS (
  SELECT a, b, count(*) AS n FROM pairs WHERE b IS NOT NULL GROUP BY a, b)
SELECT CAST(a AS BIGINT) AS tok_a, CAST(b AS BIGINT) AS tok_b,
       CAST(n AS BIGINT) AS n
FROM cnt ORDER BY n DESC, a, b LIMIT {k}
"""


def decontam_tokens_sql(
    table: str = "documents", vocab: int = 50257, g: int = 8
) -> str:
    """Exact SQL for TOKEN-level decontamination: rows with
    ord % 25 = 7 take the tokens of ord - ord%50 (always a benchmark
    ord — planted contamination, since random token grams never
    collide); benchmark = ord % 50 = 0 docs' token g-grams (as
    comma-joined VALUE strings — the oracle never trusts the engine's
    hash); corpus docs flagged + distinct-shared-gram counts."""
    n_chain, n_final = splitmix_cte_steps("nin", "x", "ntok_h", "ord, i", "smn")
    t_chain, t_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, pos", "smt"
    )
    lead_concat = " || ',' || ".join(
        f"lead(t, {k}) OVER win" if k else "t" for k in range(g)
    )
    return f"""
WITH planted AS (
  SELECT CAST(doc_id AS BIGINT) AS ord,
         CAST(CASE WHEN doc_id % 25 = 7 THEN doc_id - doc_id % 50
                   ELSE doc_id END AS HUGEINT) AS i
  FROM {table}),
nin AS (
  SELECT ord, i,
         CAST(xor(CAST(i AS UBIGINT), CAST({0x5EED_0001} AS UBIGINT))
              AS HUGEINT) AS x
  FROM planted),{n_chain},
seqs AS (
  SELECT ord, i, CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {n_final}),
positions0 AS (
  SELECT ord, i, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord, pos,
         CAST(xor(CAST(i AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),{t_chain},
toks AS (
  SELECT ord, pos, CAST(tok_h % {vocab} AS VARCHAR) AS t
  FROM {t_final}),
grams AS (
  SELECT ord, {lead_concat} AS g8
  FROM toks WINDOW win AS (PARTITION BY ord ORDER BY pos)),
bench AS (
  SELECT DISTINCT g8 FROM grams WHERE ord % 50 = 0 AND g8 IS NOT NULL),
hit AS (
  SELECT ord, count(DISTINCT g8) AS n FROM grams
  WHERE ord % 50 <> 0 AND g8 IS NOT NULL
    AND g8 IN (SELECT g8 FROM bench)
  GROUP BY ord)
SELECT s.ord,
       CAST(CASE WHEN h.ord IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_bench_grams
FROM seqs s LEFT JOIN hit h USING (ord)
WHERE s.ord % 50 <> 0
"""


def split_sequences_sql(
    table: str = "documents", vocab: int = 50257, max_len: int = 100
) -> str:
    """Exact SQL for lossless sequence splitting: every token of every
    derived sequence with part = pos // max_len and its in-part
    position — the engine's zero-copy chunking must preserve every
    token (the input_hint token-equality invariant, per part)."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, pos", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
seqs AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final}),
positions0 AS (
  SELECT ord, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord, pos,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain}
SELECT ord, CAST(pos // {max_len} AS BIGINT) AS part,
       CAST(pos % {max_len} AS BIGINT) AS pos_in_part,
       CAST(tok_h % {vocab} AS BIGINT) AS token
FROM {tok_final}
"""


def assign_splits_sql(
    table: str = "documents", key: str = "doc_id",
    cuts: tuple[tuple[str, int], ...] = (
        ("train", 900_000), ("val", 950_000), ("test", 1_000_000),
    ),
) -> str:
    """Exact SQL for deterministic split assignment: an INDEPENDENTLY
    salted splitmix draw (SPLIT_SALT — correlated with the sampling
    draw it must not be) mapped onto consecutive integer ppm ranges."""
    smx, final = splitmix_cte_steps("sin", "x", "h", key, "sm")
    cases = " ".join(
        f"WHEN h % 1000000 < {hi} THEN '{name}'"
        for name, hi in cuts[:-1]
    )
    return f"""
WITH sin AS (
  SELECT {key},
         CAST(xor(CAST({key} AS UBIGINT),
                  CAST({SPLIT_SALT_SQL} AS UBIGINT)) AS HUGEINT) AS x
  FROM {table}
),{smx}
SELECT {key}, CASE {cases} ELSE '{cuts[-1][0]}' END AS split
FROM {final}
"""


def token_rarity_sql(table: str = "documents", vocab: int = 50257) -> str:
    """Exact SQL for the token-rarity score: regenerate every token of
    every derived sequence, build the corpus histogram, and per row sum
    each token's corpus-wide count — every term an int64, so the join
    + sum is hash-exact."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
seqs AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final}),
positions0 AS (
  SELECT ord, unnest(range(0, n_tok)) AS pos FROM seqs),
positions AS (
  SELECT ord,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain},
toks AS (
  SELECT ord, CAST(tok_h % {vocab} AS BIGINT) AS token FROM {tok_final}),
hist AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
SELECT t.ord, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(h.n) AS BIGINT) AS freq_sum
FROM toks t JOIN hist h USING (token) GROUP BY t.ord
"""


def stage_metrics_sql(table: str = "documents") -> str:
    """Exact SQL for the T5 self-metrics counters over the flagship
    derive: rows_in / rows_out / inf_nan from the bad-value rule."""
    chain, final, _ = _splitmix_chain([("val_h", 0x7A57_0002)])
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain}
SELECT CAST(count(*) AS BIGINT) AS rows_in,
       CAST(count(*) FILTER (WHERE NOT (val_h % 200 = 0)) AS BIGINT)
         AS rows_out,
       CAST(count(*) FILTER (WHERE val_h % 200 = 0) AS BIGINT) AS inf_nan
FROM {final}
"""


def jaccard_clusters_sql(threshold: float = 0.8, k: int = 5,
                         table: str = "documents") -> str:
    """Exact SQL for minhash_dedup(verify_threshold=τ): connected
    components over edges {pairs with exact k-gram-set Jaccard ≥ τ},
    labels = component-min doc_id. The engine's LSH candidates have
    recall ~1 at τ=0.8 (miss prob (1-τ⁴)^32 ≈ 5e-8 per pair,
    deterministic under fixed seeds — validated at gate scales)."""
    return f"""
WITH RECURSIVE shng AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {k - 2}, 1)),
                                      x -> substr(text, x, {k}))) AS s
  FROM {table}
),
edges AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM shng x JOIN shng y ON x.doc_id < y.doc_id
  -- same IEEE comparison as the engine: float64 division then >= τ
  -- (τ·union would round differently on exact-ratio boundaries)
  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
        greatest(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 1)
        >= {threshold}
),
e2 AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT reach.doc_id, e2.b FROM reach JOIN e2 ON e2.a = reach.r
)
SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id
"""


def ivf_pruned_sql(
    d: int = 32,
    n_clusters: int = 16,
    query_cluster: int = 3,
    k: int = 10,
    salt_c: int = 0x1F5AC0DE0001,
    salt_n: int = 0x1F5AC0DE0002,
) -> str:
    """Exhaustive-oracle SQL for the pruned-IVF gate: regenerate every
    planted vector (center(vec_id % n_clusters) + 0.05·noise, both
    splitmix64-derived — queries._plant_clusters_batch) and rank ALL of
    them by cosine to cluster ``query_cluster``'s exact center. The
    engine must reproduce this top-k through nprobe<n_lists pruning."""
    smc, cfin = splitmix_cte_steps("cin", "x", "cmx", "i, j", "smc")
    smn, nfin = splitmix_cte_steps("nin", "x", "nmx", "i, j, cmx", "smn")
    smq, qfin = splitmix_cte_steps("qin", "x", "qmx", "j", "smq")
    u = "(CAST({col} % 2000001 AS DOUBLE) / 1000000.0 - 1.0)"
    return f"""
WITH dims AS (SELECT unnest(range(0, {d})) AS j),
cells AS (SELECT vec_id AS i, j FROM embeddings CROSS JOIN dims),
cin AS (SELECT i, j,
  CAST(xor(CAST((i % {n_clusters}) * 1000003 + j AS UBIGINT),
           CAST({salt_c} AS UBIGINT)) AS HUGEINT) AS x FROM cells),{smc},
nin AS (SELECT i, j, cmx,
  CAST(xor(CAST(i * 2097169 + j AS UBIGINT),
           CAST({salt_n} AS UBIGINT)) AS HUGEINT) AS x FROM {cfin}),{smn},
vec AS (SELECT i, j,
  {u.format(col='cmx')} + 0.05 * {u.format(col='nmx')} AS v FROM {nfin}),
qin AS (SELECT j,
  CAST(xor(CAST({query_cluster} * 1000003 + j AS UBIGINT),
           CAST({salt_c} AS UBIGINT)) AS HUGEINT) AS x FROM dims),{smq},
qv AS (SELECT j, {u.format(col='qmx')} AS q FROM {qfin}),
cos AS (
  SELECT i,
         sum(v * q) / (sqrt(sum(v * v)) * sqrt(sum(q * q))) AS c
  FROM vec JOIN qv USING (j) GROUP BY i
)
SELECT i AS vec_id FROM cos ORDER BY c DESC, i LIMIT {k}
"""


def semantic_dedup_sql(
    d: int = 32,
    n_clusters: int = 16,
    threshold: float = 0.95,
    salt_c: int = 0x1F5AC0DE0001,
    salt_n: int = 0x1F5AC0DE0002,
) -> str:
    """Honest oracle for the SemDeDup gate: regenerate every planted
    vector (queries._plant_clusters_batch), compute ALL pairwise
    cosines (no clustering assumption), connect pairs ≥ threshold via
    a recursive-CTE transitive closure, label each vec with the
    component min — the engine must land on identical labels through
    its cluster-pruned candidate path."""
    smc, cfin = splitmix_cte_steps("cin", "x", "cmx", "i, j", "smc")
    smn, nfin = splitmix_cte_steps("nin", "x", "nmx", "i, j, cmx", "smn")
    u = "(CAST({col} % 2000001 AS DOUBLE) / 1000000.0 - 1.0)"
    return f"""
WITH RECURSIVE dims AS (SELECT unnest(range(0, {d})) AS j),
cells AS (SELECT vec_id AS i, j FROM embeddings CROSS JOIN dims),
cin AS (SELECT i, j,
  CAST(xor(CAST((i % {n_clusters}) * 1000003 + j AS UBIGINT),
           CAST({salt_c} AS UBIGINT)) AS HUGEINT) AS x FROM cells),{smc},
nin AS (SELECT i, j, cmx,
  CAST(xor(CAST(i * 2097169 + j AS UBIGINT),
           CAST({salt_n} AS UBIGINT)) AS HUGEINT) AS x FROM {cfin}),{smn},
vec AS (SELECT i, j,
  {u.format(col='cmx')} + 0.05 * {u.format(col='nmx')} AS v FROM {nfin}),
cos AS (
  SELECT x.i AS a, y.i AS b,
         sum(x.v * y.v) /
         (sqrt(sum(x.v * x.v)) * sqrt(sum(y.v * y.v))) AS c
  FROM vec x JOIN vec y ON x.j = y.j AND x.i < y.i
  GROUP BY x.i, y.i
),
edges AS (SELECT a, b FROM cos WHERE c >= {threshold}),
e2 AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach(doc_id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT reach.doc_id, e2.b FROM reach JOIN e2 ON e2.a = reach.r
)
SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id
"""


def hll_registers_sql(table: str = "events", key: str = "user_id",
                      p: int = 12) -> str:
    """Exact SQL recomputation of the HyperLogLog register state
    (datapipe/stats.py): reg = top p bits of splitmix64(key), rank =
    leading zeros of the remaining (64-p)-bit suffix + 1 (via the
    integer-exact ``length(bin(w))`` bit length), MAX per register."""
    smx, final = splitmix_cte_steps(table, key, "h", "", "hl")
    sb = 64 - p
    return f"""
WITH {smx},
rw AS (
  SELECT CAST(h // {1 << sb} AS BIGINT) AS reg,
         h % {1 << sb} AS w
  FROM {final}
)
SELECT reg,
       MAX(CASE WHEN w = 0 THEN {sb + 1}
                ELSE {sb + 1} - length(bin(CAST(w AS BIGINT))) END
       ) AS "rank"
FROM rw GROUP BY reg
"""


# Mirrors of the engine's sketch/sampling constants (datapipe/stats.py
# CMS_SALTS, datapipe/sample.py SAMPLE_SALT) — the oracle recomputes
# from the published constants, it does not import engine code.
CMS_SALTS_SQL = (
    0x243F6A8885A308D3,
    0x13198A2E03707344,
    0x0A4093822299F31D,
    0x082EFA98EC4E6C89,
)
SAMPLE_SALT_SQL = 0x452821E638D01377
SPLIT_SALT_SQL = 0x38D01377452821E6
CAP_SALT_SQL = 0x3EB5466CF34E90C6
SHUFFLE_SALT_SQL = 0x5DDC0AC29B7C97C5


def cap_per_key_sql(
    cap: int = 10, table: str = "documents", key: str = "source"
) -> str:
    """Exact SQL recomputation of per-key document caps
    (datapipe/sample.py cap_per_key): within each key, rank rows by
    (splitmix64(doc_id ^ CAP_SALT), doc_id) and keep rank ≤ cap."""
    smx, final = splitmix_cte_steps("sin", "x", "h", f"doc_id, {key}", "sm")
    return f"""
WITH sin AS (
  SELECT doc_id, {key},
         CAST(xor(CAST(doc_id AS UBIGINT),
                  CAST({CAP_SALT_SQL} AS UBIGINT)) AS HUGEINT) AS x
  FROM {table}
),{smx},
ranked AS (
  SELECT doc_id, {key},
         row_number() OVER (PARTITION BY {key} ORDER BY h, doc_id) AS rn
  FROM {final}
)
SELECT doc_id, {key} FROM ranked WHERE rn <= {cap}
"""


def token_budget_sql(
    budget: int,
    table: str = "documents",
    key: str = "source",
    count_col: str = "n_chars",
) -> str:
    """Exact SQL recomputation of token-budget caps
    (datapipe/sample.py token_budget_per_key): a row survives iff its
    key's running count sum — in (splitmix64(doc_id ^ CAP_SALT),
    doc_id) order, INCLUDING the row — stays ≤ budget."""
    smx, final = splitmix_cte_steps(
        "sin", "x", "h", f"doc_id, {key}, {count_col}", "sm"
    )
    return f"""
WITH sin AS (
  SELECT doc_id, {key}, coalesce({count_col}, 0) AS {count_col},
         CAST(xor(CAST(doc_id AS UBIGINT),
                  CAST({CAP_SALT_SQL} AS UBIGINT)) AS HUGEINT) AS x
  FROM {table}
),{smx},
cum AS (
  SELECT doc_id, {key},
         sum({count_col}) OVER (
           PARTITION BY {key} ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS c
  FROM {final}
)
SELECT doc_id, {key} FROM cum WHERE c <= {budget}
"""


def shuffle_order_sql(table: str = "documents") -> str:
    """Exact SQL recomputation of the deterministic global shuffle
    rank (datapipe/sample.py shuffle_order): position = dense rank of
    (splitmix64(doc_id ^ SHUFFLE_SALT), doc_id), zero-based."""
    smx, final = splitmix_cte_steps("sin", "x", "h", "doc_id", "sm")
    return f"""
WITH sin AS (
  SELECT doc_id,
         CAST(xor(CAST(doc_id AS UBIGINT),
                  CAST({SHUFFLE_SALT_SQL} AS UBIGINT)) AS HUGEINT) AS x
  FROM {table}
),{smx}
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
         AS shuffle_pos
FROM {final}
"""


def cms_cells_sql(table: str = "events", key: str = "user_id",
                  d: int = 4, w: int = 1024) -> str:
    """Exact SQL recomputation of the count-min cell state
    (datapipe/stats.py cms_sketch): for each of the d hash rows,
    col = splitmix64(key xor salt_r) mod w, cnt = rows hashing there."""
    salts = ", ".join(
        f"({r}, {CMS_SALTS_SQL[r]})" for r in range(d)
    )
    smx, final = splitmix_cte_steps("kin", "x", "h", "r", "cm")
    return f"""
WITH salts(r, s) AS (VALUES {salts}),
kin AS (
  SELECT r,
         CAST(xor(CAST({key} AS UBIGINT), CAST(s AS UBIGINT)) AS HUGEINT) AS x
  FROM {table} CROSS JOIN salts
),{smx}
SELECT r AS "row", CAST(h % {w} AS BIGINT) AS col, count(*) AS cnt
FROM {final} GROUP BY r, h % {w}
"""


def hash_sample_sql(
    table: str = "documents",
    key: str = "doc_id",
    carry: str = "source",
    default_ppm: int = 500_000,
    rates_ppm: dict[str, int] | None = None,
) -> str:
    """Exact SQL recomputation of the deterministic stratified sampler
    (datapipe/sample.py): keep a row iff
    splitmix64(key xor SALT) mod 1e6 < its stratum's ppm rate."""
    rates = rates_ppm or {}
    case = "".join(
        f"WHEN '{v}' THEN {p} " for v, p in sorted(rates.items())
    )
    rate_expr = (
        f"CASE {carry} {case}ELSE {default_ppm} END" if rates
        else str(default_ppm)
    )
    smx, final = splitmix_cte_steps("sin", "x", "h", f"{key}, {carry}", "sm")
    return f"""
WITH sin AS (
  SELECT {key}, {carry},
         CAST(xor(CAST({key} AS UBIGINT),
                  CAST({SAMPLE_SALT_SQL} AS UBIGINT)) AS HUGEINT) AS x
  FROM {table}
),{smx}
SELECT {key}, {carry} FROM {final}
WHERE h % 1000000 < {rate_expr}
"""


def mixture_sample_sql(table: str = "documents") -> str:
    """Exact SQL recomputation of temperature-2 mixture sampling
    (datapipe/sample.py mixture_sample) over the DERIVED sequence
    table (skewed source mix: web 70 / books 15 / code 10 / wiki 5):
    per-stratum keep rate floor(1e6·sqrt(min_n/n)) — division, sqrt,
    multiply, floor are all IEEE correctly rounded, so DuckDB lands on
    the identical integer ppm — then the same splitmix64 threshold
    test as hash_sample."""
    chain, dfinal, _ = _splitmix_chain([("src_h", 0x5EED_0002)])
    smx, final = splitmix_cte_steps("sin", "x", "h", "ord, source", "sm")
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
d AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CASE WHEN src_h % 100 < 70 THEN 'web'
              WHEN src_h % 100 < 85 THEN 'books'
              WHEN src_h % 100 < 95 THEN 'code'
              ELSE 'wiki' END AS source
  FROM {dfinal}),
c AS (SELECT source, count(*) AS n FROM d GROUP BY source),
mn AS (SELECT min(n) AS m FROM c),
r AS (
  SELECT source,
         CAST(least(1000000, floor(
           1000000.0 * sqrt(CAST(m AS DOUBLE) / CAST(n AS DOUBLE))
         )) AS BIGINT) AS ppm
  FROM c, mn
),
sin AS (
  SELECT ord, source,
         CAST(xor(CAST(ord AS UBIGINT),
                  CAST({SAMPLE_SALT_SQL} AS UBIGINT)) AS HUGEINT) AS x
  FROM d
),{smx}
SELECT f.ord, f.source FROM {final} f JOIN r USING (source)
WHERE f.h % 1000000 < r.ppm
"""


def hll_group_registers_sql(table: str = "events", group: str = "event_type",
                            key: str = "user_id", p: int = 12) -> str:
    """Exact SQL recomputation of the PER-GROUP HyperLogLog register
    states (datapipe/stats.py hll_sketch_by_group): same reg/rank math
    as hll_registers_sql, MAX per (group, register)."""
    smx, final = splitmix_cte_steps(table, key, "h", group, "hg")
    sb = 64 - p
    return f"""
WITH {smx},
rw AS (
  SELECT {group},
         CAST(h // {1 << sb} AS BIGINT) AS reg,
         h % {1 << sb} AS w
  FROM {final}
)
SELECT {group}, reg,
       MAX(CASE WHEN w = 0 THEN {sb + 1}
                ELSE {sb + 1} - length(bin(CAST(w AS BIGINT))) END
       ) AS "rank"
FROM rw GROUP BY {group}, reg
"""


def pack_emit_sql(table: str = "documents", vocab: int = 50257,
                  seq_len: int = 128) -> str:
    """Exact SQL for the packed-sequence EMISSION gate: regenerate every
    sequence row's token list from doc_id (same splitmix rules as
    sequences_from_documents_batch), lay the docs end to end in ord
    order via a window prefix sum, and cut into seq_len-token
    sequences — (seq_id, pos_in_seq, token, src_id) for every token
    (src_id = the source document, the attention-boundary column a
    packed training stream needs to rebuild document masks)."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "gp, ord", "sm_tok"
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
seqs AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n_tok
  FROM {final}),
offs AS (
  SELECT ord, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
           ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS o
  FROM seqs),
positions0 AS (
  SELECT ord, o, unnest(range(0, n_tok)) AS pos FROM offs),
positions AS (
  SELECT ord, o + pos AS gp,
         CAST(xor(CAST(ord AS UBIGINT) * 1048576, CAST(pos AS UBIGINT))
              AS HUGEINT) AS x
  FROM positions0),
{tok_chain}
SELECT CAST(gp // {seq_len} AS BIGINT) AS seq_id,
       CAST(gp % {seq_len} AS BIGINT) AS pos_in_seq,
       CAST(tok_h % {vocab} AS BIGINT) AS token,
       CAST(ord AS BIGINT) AS src_id
FROM {tok_final}
"""


def bpe_doc_counts_sql(
    merges: list[tuple[str, str]],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "n_tok_bpe_exact",
) -> str:
    """Exact BPE token count per document, recomputed from first
    principles: the merges table rides in as VALUES and a recursive CTE
    replays the engine's rank-greedy loop per DISTINCT word (each step
    merges the lowest-rank pair present, leftmost occurrence first),
    then per-doc counts come from a word join. Pre-tokenization is the
    same whitespace split the engine uses."""
    vals = ", ".join(
        "('{}', '{}', {})".format(
            left.replace("'", "''"), right.replace("'", "''"), i
        )
        for i, (left, right) in enumerate(merges)
    )
    # tie-break key: rank first, then leftmost position (positions are
    # bounded by the word length, far below the 2^20 scale factor)
    best = (
        "(SELECT arg_min(p.i, m.rnk * 1048576 + p.i) "
        "FROM (SELECT unnest(range(1, len(syms))) AS i) p "
        "JOIN merges m ON m.l = syms[p.i] AND m.r = syms[p.i+1])"
    )
    return rf"""
WITH RECURSIVE
merges(l, r, rnk) AS (VALUES {vals}),
words AS (
  SELECT DISTINCT unnest(
    regexp_split_to_array(coalesce({text_col}, ''), '\s+')) AS w
  FROM {table}
),
rec(w, syms) AS (
  SELECT w, regexp_extract_all(w, '.') AS syms FROM words WHERE w <> ''
  UNION ALL
  SELECT w,
    list_concat(
      list_concat(syms[1:best_i-1], [syms[best_i] || syms[best_i+1]]),
      syms[best_i+2:]
    )
  FROM (SELECT w, syms, {best} AS best_i FROM rec)
  WHERE best_i IS NOT NULL
),
word_tok AS (
  SELECT w, len(syms) AS n
  FROM (SELECT w, syms, {best} AS best_i FROM rec)
  WHERE best_i IS NULL
),
doc_words AS (
  SELECT {id_col}, unnest(
    regexp_split_to_array(coalesce({text_col}, ''), '\s+')) AS w
  FROM {table}
)
SELECT d.{id_col},
       CAST(COALESCE(
         SUM(CASE WHEN d.w = '' THEN 0 ELSE wt.n END), 0) AS BIGINT)
         AS {out_col}
FROM doc_words d LEFT JOIN word_tok wt ON wt.w = d.w
GROUP BY d.{id_col}
"""


def span_dedup_sql(
    table: str = "documents", vocab: int = 50257, w: int = 8
) -> str:
    """Exact SQL for duplicate-span removal (ExactSubstr, keep='first'):
    regenerate every token with the PLANT rule (a doc with
    ord % 5 = 2 copies the first L = min(40, n_self, n_src) tokens of
    doc ord-2 — real duplicated spans), enumerate every w-token window
    as its VALUE string (the engine groups by a 128-bit rolling hash;
    the oracle groups by the actual window, so a collision or an
    off-by-one in the rolling prefix trick would hash-mismatch), mark
    every occurrence but the global (ord, pos)-first, delete covered
    tokens, and emit the kept stream re-positioned per doc."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, p", "sm_tok"
    )
    g_parts = " || '-' || ".join(
        ["CAST(token AS VARCHAR)"]
        + [
            f"CAST(lead(token, {k}) OVER w AS VARCHAR)"
            for k in range(1, w)
        ]
    )
    return f"""
WITH base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
ntab AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n
  FROM {final}),
plant AS (
  SELECT a.ord, a.n,
         CASE WHEN a.ord % 5 = 2 THEN least(40, a.n, b.n) ELSE 0 END AS L
  FROM ntab a LEFT JOIN ntab b ON b.ord = a.ord - 2),
positions0 AS (
  SELECT ord, L, unnest(range(0, n)) AS p FROM plant),
positions AS (
  SELECT ord, p,
         CAST(xor(CAST((CASE WHEN p < L THEN ord - 2 ELSE ord END)
                       AS UBIGINT) * 1048576,
                  CAST(p AS UBIGINT)) AS HUGEINT) AS x
  FROM positions0),
{tok_chain},
toks AS (
  SELECT ord, p, CAST(tok_h % {vocab} AS BIGINT) AS token
  FROM {tok_final}),
wins AS (
  SELECT ord, p, {g_parts} AS gw,
         lead(token, {w - 1}) OVER w AS t_last
  FROM toks WINDOW w AS (PARTITION BY ord ORDER BY p)),
occ AS (SELECT ord, p, gw FROM wins WHERE t_last IS NOT NULL),
marks AS (
  SELECT ord, p FROM (
    SELECT ord, p,
           row_number() OVER (PARTITION BY gw ORDER BY ord, p) AS rn
    FROM occ)
  WHERE rn > 1),
kept AS (
  SELECT t.ord, t.p, t.token FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM marks m
    WHERE m.ord = t.ord AND t.p BETWEEN m.p AND m.p + {w - 1}))
SELECT ord,
       CAST(row_number() OVER (PARTITION BY ord ORDER BY p) - 1
            AS BIGINT) AS pos,
       token
FROM kept
"""


def token_jaccard_clusters_sql(
    threshold: float = 0.8, k: int = 8,
    table: str = "documents", vocab: int = 50257,
) -> str:
    """Exact SQL for minhash_dedup(shingles='tokens'): regenerate every
    token with the PLANT rule (ord % 9 = 4 takes the FULL token array
    of ord-4 with the last two tokens replaced by its own derive —
    J = (n-9)/(n-5), so planted pairs with n_src >= 25 merge and
    shorter ones land exactly under the 0.8 threshold: a boundary
    fixture), build every k-token gram by VALUE string, take exact
    per-doc distinct-gram-set Jaccard, and close components
    recursively. Same IEEE double division as the engine."""
    chain, final, _ = _splitmix_chain([("ntok_h", 0x5EED_0001)])
    tok_chain, tok_final = splitmix_cte_steps(
        "positions", "x", "tok_h", "ord, p", "sm_tok"
    )
    g_parts = " || '-' || ".join(
        ["CAST(token AS VARCHAR)"]
        + [
            f"CAST(lead(token, {j}) OVER w AS VARCHAR)"
            for j in range(1, k)
        ]
    )
    return f"""
WITH RECURSIVE base AS (SELECT CAST(doc_id AS HUGEINT) AS i FROM {table}),
{chain},
ntab AS (
  SELECT CAST(i AS BIGINT) AS ord,
         CAST(16 + (ntok_h % 497) AS BIGINT) AS n
  FROM {final}),
eff AS (
  SELECT a.ord,
         CASE WHEN a.ord % 9 = 4 THEN b.n ELSE a.n END AS n,
         (a.ord % 9 = 4) AS planted
  FROM ntab a LEFT JOIN ntab b ON b.ord = a.ord - 4),
positions0 AS (
  SELECT ord, n, planted, unnest(range(0, n)) AS p FROM eff),
positions AS (
  SELECT ord, p,
         CAST(xor(CAST((CASE WHEN planted AND p < n - 2
                             THEN ord - 4 ELSE ord END)
                       AS UBIGINT) * 1048576,
                  CAST(p AS UBIGINT)) AS HUGEINT) AS x
  FROM positions0),
{tok_chain},
toks AS (
  SELECT ord, p, CAST(tok_h % {vocab} AS BIGINT) AS token
  FROM {tok_final}),
wins AS (
  SELECT ord, p, {g_parts} AS gw,
         lead(token, {k - 1}) OVER w AS t_last
  FROM toks WINDOW w AS (PARTITION BY ord ORDER BY p)),
shng AS (
  SELECT ord AS doc_id, list_distinct(list(gw)) AS s
  FROM wins WHERE t_last IS NOT NULL GROUP BY ord),
edges AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM shng x JOIN shng y ON x.doc_id < y.doc_id
  WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
        greatest(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)), 1)
        >= {threshold}
),
e2 AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach(doc_id, r) AS (
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM {table}
  UNION
  SELECT reach.doc_id, e2.b FROM reach JOIN e2 ON e2.a = reach.r
)
SELECT doc_id, min(r) AS cluster FROM reach GROUP BY doc_id
"""
