"""DuckDB SQL generators that reproduce the engine's hash kernels bit-exactly.

The driver's correctness gate runs each registered query AND its
``oracle_sql()`` string side by side; queries whose results depend on the
engine's deterministic hashes (splitmix64, byte-polynomial token hashes,
seeded MinHash permutations) were previously "rows-only" on the assumption
the hashes were not SQL-expressible.  They are: splitmix64 is pure u64
arithmetic (mod-2**64 multiplies via a HUGEINT detour), and the token hash
is a byte polynomial foldable with ``list_reduce`` over per-character
codepoints (the test tables are ASCII, so codepoint == byte).  Every
generator here is validated bit-for-bit against the numpy kernel in
tests/test_sql_oracle.py.

Only ORACLES use this module — the engine's hot paths stay numpy/Arrow.
"""

from __future__ import annotations

# splitmix64 constants (mirror hashing.py)
_GAMMA = 0x9E3779B97F4A7C15  # 11400714819323198485
_M1 = 0xBF58476D1CE4E5B9  # 13787848793156543929
_M2 = 0x94D049BB133111EB  # 10723151780598845931
_POLY_P = _GAMMA  # odd multiplier for polynomial combines
_MOD64 = 1 << 64
_MASK32 = (1 << 32) - 1
_KIND_CAPTION = 0x5CA1AB1EC0FFEE01


def mulmod64(x: str, c: int) -> str:
    """SQL for ``(x * c) mod 2**64`` — ``x`` a UBIGINT expression, ``c`` a
    u64 constant.  UBIGINT multiply raises on overflow, so split ``x`` into
    32-bit halves and combine through HUGEINT (each partial < 2**96)."""
    return (
        f"CAST(((CAST(({x}) & 4294967295 AS HUGEINT) * {c}) + "
        f"(((CAST(({x}) >> 32 AS HUGEINT) * {c}) % 4294967296) * 4294967296)) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def signed64(x: str) -> str:
    """SQL reinterpreting UBIGINT expression ``x`` as two's-complement
    BIGINT — query outputs use signed ids so the driver's comparator sees
    one integer type on both sides."""
    return (
        f"CAST((CAST({x} AS HUGEINT) - CASE WHEN {x} >= 9223372036854775808 "
        f"THEN 18446744073709551616 ELSE 0 END) AS BIGINT)"
    )


def addmod64(a: str, b: str) -> str:
    """SQL for ``(a + b) mod 2**64`` over UBIGINT expressions."""
    return (
        f"CAST((CAST(({a}) AS HUGEINT) + CAST(({b}) AS HUGEINT)) "
        f"% 18446744073709551616 AS UBIGINT)"
    )


def sm64_steps(x: str, out: str, tag: str) -> list[tuple[str, str]]:
    """Column-step chain ``[(name, expr), ...]`` computing
    ``out = splitmix64(x)``; intermediates are named ``__<tag>N``."""
    a, b, c, d, e = (f"__{tag}{i}" for i in range(5))
    return [
        (a, addmod64(x, str(_GAMMA))),
        (b, f"xor({a}, {a} >> 30)"),
        (c, mulmod64(b, _M1)),
        (d, f"xor({c}, {c} >> 27)"),
        (e, mulmod64(d, _M2)),
        (out, f"xor({e}, {e} >> 31)"),
    ]


def chain_select(inner: str, steps: list[tuple[str, str]]) -> str:
    """Wrap subquery ``inner`` in one nested SELECT per (name, expr) step,
    then strip the ``__``-prefixed temporaries."""
    q = f"({inner})"
    for name, expr in steps:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    tmp = [n for n, _ in steps if n.startswith("__")]
    if tmp:
        q = f"(SELECT * EXCLUDE ({', '.join(tmp)}) FROM {q})"
    return q


def poly_fold_expr(tok: str) -> str:
    """SQL for the byte-polynomial fold ``h = h*P + byte`` over the ASCII
    characters of string expression ``tok`` (mod 2**64) — mirrors the inner
    loop of ``hashing.token_hashes_flat``.  Result type UBIGINT."""
    mul_acc = (
        f"(((acc % 4294967296) * {_POLY_P}) + "
        f"((((acc // 4294967296) * {_POLY_P}) % 4294967296) * 4294967296)) "
        f"% 18446744073709551616"
    )
    return (
        f"CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        f"list_transform(regexp_extract_all({tok}, '.'), "
        f"c -> CAST(ord(c) AS HUGEINT))), "
        f"(acc, x) -> ({mul_acc} + x) % 18446744073709551616) AS UBIGINT)"
    )


# one proven tokenisation (str.split() semantics over ASCII): hash-green via
# the token_counts oracle since round 1
def tokens_select(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """Subquery producing ``(id_col, pos, tok)`` — one row per whitespace
    token occurrence, 1-based position, empty docs contribute nothing."""
    return (
        f"(SELECT {id_col}, "
        f"unnest(range(1, len(regexp_split_to_array(trim({text_col}), '\\s+')) + 1)) AS pos, "
        f"unnest(regexp_split_to_array(trim({text_col}), '\\s+')) AS tok "
        f"FROM {table} WHERE trim({text_col}) <> '')"
    )


def token_hash_select(tokens_sub: str) -> str:
    """Subquery mapping ``tokens_sub`` (doc_id, pos, tok) to
    ``(doc_id, pos, tokh)`` where ``tokh = splitmix64(byte_poly(tok))`` —
    the engine's ``token_hashes_flat`` value.  Hashes are computed once per
    DISTINCT token, then joined back to occurrences."""
    dh = chain_select(
        f"SELECT tok, {poly_fold_expr('tok')} AS h1 FROM (SELECT DISTINCT tok FROM {tokens_sub} t)",
        sm64_steps("h1", "tokh", "th"),
    )
    return (
        f"(SELECT t.doc_id, t.pos, d.tokh FROM {tokens_sub} t "
        f"JOIN {dh} d USING (tok))"
    )


def _horner_expr(terms: list[str]) -> str:
    """SQL for the Horner fold ``((t0*P + t1)*P + t2)...`` mod 2**64."""
    acc = terms[0]
    for t in terms[1:]:
        acc = addmod64(mulmod64(acc, _POLY_P), t)
    return acc


def shingles_select(tokens_sub: str, ngram: int) -> str:
    """Subquery producing ``(doc_id, sh)`` — one row per word-``ngram``
    shingle hash occurrence, mirroring ``hashing.shingle_hashes`` (docs with
    1..ngram-1 tokens emit a single whole-doc fold; empty docs emit none;
    values are 32-bit: ``splitmix64(fold) & 0xFFFFFFFF``)."""
    th = token_hash_select(tokens_sub)
    arrs = (
        f"(SELECT doc_id, list(tokh ORDER BY pos) AS hs, count(*) AS n "
        f"FROM {th} th GROUP BY doc_id)"
    )
    # long docs: one row per window start i, Horner over hs[i..i+ngram-1]
    window_terms = [f"CAST(hs[i + {j}] AS UBIGINT)" for j in range(ngram)]
    long_q = chain_select(
        f"SELECT doc_id, {_horner_expr(window_terms)} AS fold FROM "
        f"(SELECT doc_id, hs, unnest(range(1, n - {ngram} + 2)) AS i "
        f"FROM {arrs} q WHERE q.n >= {ngram}) a",
        sm64_steps("fold", "shw", "sg"),
    )
    # short docs: whole-doc variable-length Horner via list_reduce
    mul_acc = (
        f"(((acc % 4294967296) * {_POLY_P}) + "
        f"((((acc // 4294967296) * {_POLY_P}) % 4294967296) * 4294967296)) "
        f"% 18446744073709551616"
    )
    short_fold = (
        f"CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        f"list_transform(hs, x -> CAST(x AS HUGEINT))), "
        f"(acc, x) -> ({mul_acc} + x) % 18446744073709551616) AS UBIGINT)"
    )
    short_q = chain_select(
        f"SELECT doc_id, {short_fold} AS fold FROM {arrs} a WHERE a.n < {ngram}",
        sm64_steps("fold", "shw", "sg"),
    )
    return (
        f"(SELECT doc_id, shw & 4294967295 AS sh FROM {long_q} "
        f"UNION ALL SELECT doc_id, shw & 4294967295 AS sh FROM {short_q})"
    )


def _perm_constants(num_perm: int, seed: int):
    from .hashing import make_permutations

    a, b = make_permutations(num_perm, seed)
    return [int(x) for x in a], [int(x) for x in b]


def lsh_bands_select(
    threshold: float = 0.7,
    num_perm: int = 64,
    ngram: int = 5,
    seed: int = 42,
    table: str = "documents",
) -> str:
    """Subquery producing ``(doc_id, bk)`` — one row per caption LSH band
    key, exactly the engine's ``hashing.band_keys`` over 64-perm MinHash
    signatures (docs without shingles emit no rows, mirroring ``has_sig``)."""
    from .config import optimal_param

    bands, rows = optimal_param(threshold, num_perm)
    a_c, b_c = _perm_constants(num_perm, seed)
    sh = shingles_select(tokens_select(table), ngram)
    sig_cols = ", ".join(
        f"min((sh * {a_c[p]} + {b_c[p]}) % 4294967291) AS s{p}"
        for p in range(bands * rows)
    )
    sig = f"(SELECT doc_id, {sig_cols} FROM {sh} s GROUP BY doc_id)"
    # band key b: splitmix64(fold of seeds[b] over the band's R sig values)
    steps: list[tuple[str, str]] = []
    for bd in range(bands):
        seed_b = (bd * _GAMMA + _KIND_CAPTION) % _MOD64
        acc = str(seed_b)
        terms = [f"s{bd * rows + j}" for j in range(rows)]
        acc = _horner_expr([acc] + terms)
        steps.extend(sm64_steps(acc, f"k{bd}", f"b{bd}"))
    keyed = chain_select(f"SELECT * FROM {sig} sg", steps)
    band_list = ", ".join(f"k{bd}" for bd in range(bands))
    return f"(SELECT doc_id, unnest([{band_list}]) AS bk FROM {keyed})"


def minhash_cc_keep_sql(
    threshold: float = 0.7,
    num_perm: int = 64,
    ngram: int = 5,
    seed: int = 42,
    table: str = "documents",
) -> str:
    """Full flagship oracle: word-``ngram`` shingles -> 64-perm MinHash ->
    (B, R) LSH band keys -> band-share graph -> connected components ->
    keep the min-id representative of every component (plus singletons).
    Matches ``MinHashDedupePipeline`` over the documents table exactly
    (pipelines/dedupe.py; band math hashing.py:213-293)."""
    bands_q = lsh_bands_select(threshold, num_perm, ngram, seed, table)
    return f"""
        WITH RECURSIVE bandrows AS (SELECT * FROM {bands_q} bq),
        grp AS (SELECT bk, min(doc_id) AS mn FROM bandrows GROUP BY bk),
        edge AS (
            SELECT DISTINCT g.mn AS u, b.doc_id AS v
            FROM bandrows b JOIN grp g USING (bk) WHERE b.doc_id <> g.mn
        ),
        sym AS (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        rep AS (
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS rep
            FROM {table} d LEFT JOIN reach r ON r.u = d.doc_id
            GROUP BY d.doc_id
        )
        SELECT doc_id FROM rep WHERE rep = doc_id ORDER BY doc_id
    """


def incremental_near_keep_sql(
    threshold: float = 0.7,
    num_perm: int = 64,
    ngram: int = 5,
    seed: int = 42,
    table: str = "documents",
) -> str:
    """Oracle for ``functions.incremental.incremental_near_dedupe`` with the
    registered even/odd corpus/wave split: a wave (odd-id) doc is dropped
    iff it shares >= 1 LSH band key with any corpus (even-id) doc; docs
    without shingles are always kept."""
    bands_q = lsh_bands_select(threshold, num_perm, ngram, seed, table)
    return f"""
        WITH bands AS (SELECT * FROM {bands_q} bq),
        hits AS (
            SELECT DISTINCT w.doc_id
            FROM bands w JOIN bands c USING (bk)
            WHERE w.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        )
        SELECT d.doc_id FROM {table} d
        WHERE d.doc_id % 2 = 1 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
        ORDER BY d.doc_id
    """


def simhash_cc_keep_sql(max_hamming: int = 3, table: str = "documents") -> str:
    """SimHash dedupe oracle: 64-bit SimHash per doc (±1 bit votes over
    1-gram token shingles, ``hashing.simhash64``), full Hamming<=k pair
    graph, connected components, keep min-id representatives.  Valid
    because the engine's 4 pHash sub-bands recall every pair within
    Hamming<4 by pigeonhole and the group contraction Hamming-verifies all
    cross-payload rep pairs (stages/candidates.py:117-150) — the component
    structure equals the full Hamming<=k graph's."""
    toks = tokens_select(table)
    th = token_hash_select(toks)
    # shingle (ngram=1): splitmix64(tokh) & MASK32, then wide = splitmix64(sh)
    wide = chain_select(
        chain_select(f"SELECT doc_id, tokh FROM {th} t", sm64_steps("tokh", "shw", "s1")),
        sm64_steps("shw & 4294967295", "wide", "s2"),
    )
    s_cols = ", ".join(
        f"sum(CAST((wide >> {j}) & 1 AS BIGINT)) AS s{j}" for j in range(64)
    )
    bit_sum = " + ".join(
        f"(CASE WHEN 2 * s{j} > n THEN CAST({1 << j} AS UBIGINT) ELSE 0 END)"
        for j in range(64)
    )
    return f"""
        WITH RECURSIVE votes AS (
            SELECT doc_id, count(*) AS n, {s_cols} FROM {wide} w GROUP BY doc_id
        ),
        sh AS (
            SELECT d.doc_id, coalesce(({bit_sum}), 0) AS simhash
            FROM {table} d LEFT JOIN votes v ON d.doc_id = v.doc_id
        ),
        edge AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
        ),
        reach(u, v) AS (
            SELECT u, v FROM edge
            UNION
            SELECT r.u, e.v FROM reach r JOIN edge e ON r.v = e.u WHERE e.v <> r.u
        ),
        rep AS (
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS rep
            FROM {table} d LEFT JOIN reach r ON r.u = d.doc_id
            GROUP BY d.doc_id
        )
        SELECT doc_id FROM rep WHERE rep = doc_id ORDER BY doc_id
    """


def mix_sources_sql(
    weights: dict[str, float],
    seed: int,
    default_weight: float = 1.0,
    table: str = "documents",
) -> str:
    """Oracle for ``functions.mixing.mix_sources`` over int64 ids:
    ``copies = floor(w) + (u53 < frac(w))`` with
    ``u53 = (splitmix64(uint64(id) ^ seed) >> 11) / 2**53``."""
    w_case = " ".join(
        f"WHEN source = '{s}' THEN CAST({float(w)} AS DOUBLE)" for s, w in weights.items()
    )
    base = chain_select(
        f"SELECT doc_id, source, CASE {w_case} ELSE CAST({float(default_weight)} AS DOUBLE) END AS w, "
        f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT)) AS hx FROM {table}",
        sm64_steps("hx", "h", "mx"),
    )
    return f"""
        WITH drawn AS (
            SELECT doc_id, source,
                   CAST(floor(w) AS BIGINT)
                   + CASE WHEN CAST(h >> 11 AS DOUBLE) / 9007199254740992.0 < w - floor(w)
                          THEN 1 ELSE 0 END AS copies
            FROM {base} b
        )
        SELECT doc_id, source, CAST(unnest(range(0, copies)) AS BIGINT) AS epoch_copy
        FROM drawn
        ORDER BY doc_id, epoch_copy
    """


def shuffle_shard_sql(n_shards: int, seed: int, table: str = "documents") -> str:
    """Oracle for ``sources.io.shuffle_export`` placement over int64 ids:
    ``shard = splitmix64(uint64(id) ^ seed) % n_shards``."""
    base = chain_select(
        f"SELECT doc_id, xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT)) AS hx FROM {table}",
        sm64_steps("hx", "h", "sx"),
    )
    return f"""
        SELECT doc_id, CAST(h % {n_shards} AS BIGINT) AS shard
        FROM {base} b ORDER BY doc_id
    """


def _pack_layout_cte(max_tokens: int, num_partitions: int, table: str) -> str:
    """Shared CTE text computing the ``pack_sequences`` fragment layout:
    (part, doc_id, n_tokens, cum, k, lo, hi, seq_id).  Partition =
    ``splitmix64(splitmix64(uint64(doc_id))) % num_partitions``
    (stages/util._key_partition with h0=0); within a partition docs are laid
    out in doc_id order and cut every ``max_tokens`` tokens."""
    counted = (
        f"SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 "
        f"ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) END AS n_tokens "
        f"FROM {table}"
    )
    steps = sm64_steps("CAST(doc_id AS UBIGINT)", "h1p", "p1") + sm64_steps(
        "h1p", "h2p", "p2"
    )
    parted = chain_select(counted, steps)
    return f"""
        parts AS (
            SELECT doc_id, n_tokens, CAST(h2p % {num_partitions} AS BIGINT) AS part
            FROM (SELECT * EXCLUDE (h1p) FROM {parted}) q
        ),
        laid AS (
            SELECT *, CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY part ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum,
                   min(doc_id) OVER (PARTITION BY part) AS part_min
            FROM parts
        ),
        spans AS (
            SELECT *, cum // {max_tokens} AS first_k,
                   CASE WHEN n_tokens > 0 THEN (cum + n_tokens - 1) // {max_tokens}
                        ELSE cum // {max_tokens} END AS last_k
            FROM laid
        ),
        frags0 AS (
            SELECT *, unnest(range(first_k, last_k + 1)) AS k FROM spans
        ),
        frags AS (
            SELECT part, doc_id, n_tokens, part_min, k,
                   greatest(k * {max_tokens} - cum, 0) AS lo,
                   greatest(least((k + 1) * {max_tokens} - cum, n_tokens),
                            greatest(k * {max_tokens} - cum, 0)) AS hi
            FROM frags0
        )
    """


def pack_sequences_sql(
    max_tokens: int, num_partitions: int = 16, table: str = "documents"
) -> str:
    """Oracle for ``functions.packing.pack_sequences``: the fragment layout
    rows (seq_id, doc_id, tok_start, tok_end) sorted by (doc_id, tok_start)."""
    layout = _pack_layout_cte(max_tokens, num_partitions, table)
    base_steps = sm64_steps("CAST(part_min AS UBIGINT)", "hbase", "pb")
    sid_steps = sm64_steps("xor(hbase, CAST(k AS UBIGINT))", "seq_id", "ps")
    seqed = chain_select("SELECT * FROM frags", base_steps + sid_steps)
    return f"""
        WITH {layout}
        SELECT {signed64('seq_id')} AS seq_id, doc_id,
               CAST(lo AS BIGINT) AS tok_start, CAST(hi AS BIGINT) AS tok_end
        FROM (SELECT * EXCLUDE (hbase) FROM {seqed}) f
        ORDER BY doc_id, tok_start
    """


def packed_texts_sql(
    max_tokens: int, num_partitions: int = 16, table: str = "documents"
) -> str:
    """Oracle for ``functions.packing.materialize_sequences``: per-sequence
    concatenated token blocks (seq_id, text, n_tokens); fragments join in
    ascending doc_id order, empty fragments skipped."""
    layout = _pack_layout_cte(max_tokens, num_partitions, table)
    base_steps = sm64_steps("CAST(part_min AS UBIGINT)", "hbase", "pb")
    sid_steps = sm64_steps("xor(hbase, CAST(k AS UBIGINT))", "seq_id", "ps")
    seqed = chain_select("SELECT * FROM frags", base_steps + sid_steps)
    return f"""
        WITH {layout},
        keyed AS (SELECT * EXCLUDE (hbase) FROM {seqed}),
        texts AS (
            SELECT k.seq_id, k.doc_id, k.lo, k.hi,
                   array_to_string(list_slice(
                       list_filter(regexp_split_to_array(trim(d.text), '\\s+'), t -> t <> ''),
                       k.lo + 1, k.hi), ' ') AS frag,
                   k.hi - k.lo AS n_toks
            FROM keyed k JOIN {table} d USING (doc_id)
        )
        SELECT {signed64('seq_id')} AS seq_id,
               coalesce(string_agg(frag, ' ' ORDER BY doc_id) FILTER (WHERE frag <> ''), '') AS text,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens
        FROM texts GROUP BY seq_id ORDER BY 1
    """
