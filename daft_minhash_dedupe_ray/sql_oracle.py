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
    """Wrap subquery ``inner`` in one column-adding step per (name, expr),
    then strip the ``__``-prefixed temporaries.  Emitted as a FLAT local
    WITH-chain (``(WITH c0 AS ..., c1 AS (SELECT *, e FROM c0) ... )``):
    nesting one subquery per step blew DuckDB's parser past its memory
    guard at ~240 steps (the 16x8 band fold).  CTE names are scoped to this
    subquery; nested chains shadow harmlessly."""
    if not steps:
        return f"({inner})"
    tag = steps[0][0].strip("_")
    src = inner if inner.lstrip().startswith("(") else f"(SELECT * FROM ({inner}) __src)"
    parts = [f"__cs_{tag}_0 AS (SELECT * FROM {src} __b)"]
    prev = f"__cs_{tag}_0"
    for i, (name, expr) in enumerate(steps, 1):
        cur = f"__cs_{tag}_{i}"
        parts.append(f"{cur} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cur
    tmp = [n for n, _ in steps if n.startswith("__")]
    final = f"SELECT * EXCLUDE ({', '.join(tmp)}) FROM {prev}" if tmp else f"SELECT * FROM {prev}"
    return f"(WITH {', '.join(parts)} {final})"


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
        f"(SELECT {id_col} AS doc_id, "
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
    bands: int | None = None,
    rows: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Subquery producing ``(doc_id, bk)`` — one row per caption LSH band
    key, exactly the engine's ``hashing.band_keys`` over ``num_perm``-perm
    MinHash signatures (docs without shingles emit no rows, mirroring
    ``has_sig``).  ``bands``/``rows`` mirror the config's explicit override
    path (e.g. NORTH_STAR_CONFIG's 16x8); default derives from
    ``optimal_param(threshold, num_perm)``."""
    from .config import optimal_param

    if bands is None or rows is None:
        bands, rows = optimal_param(threshold, num_perm)
    sh = shingles_select(tokens_select(table, id_col=id_col, text_col=text_col), ngram)
    return bands_from_shingles_select(sh, num_perm, bands, rows, seed)


def bands_from_shingles_select(
    shingles_sub: str, num_perm: int, bands: int, rows: int, seed: int
) -> str:
    """Subquery mapping ``shingles_sub`` (doc_id, sh) — 32-bit shingle
    values — to ``(doc_id, bk)``: one row per LSH band key, exactly the
    engine's ``minhash_signatures`` + ``band_keys`` (docs absent from
    ``shingles_sub`` emit no rows, mirroring ``has_sig``)."""
    a_c, b_c = _perm_constants(num_perm, seed)
    sig_cols = ", ".join(
        f"min((sh * {a_c[p]} + {b_c[p]}) % 4294967291) AS s{p}"
        for p in range(bands * rows)
    )
    sig = f"(SELECT doc_id, {sig_cols} FROM {shingles_sub} s GROUP BY doc_id)"
    # band key b: splitmix64(fold of seeds[b] over the band's R sig values).
    # Two statement-size traps here (both hit in round 3): a nested R-deep
    # Horner doubles per level (1.2 MB SQL, minutes of binding), and carrying
    # all num_perm sig columns through ~240 chained steps costs the binder
    # layers x columns.  So: one list_reduce fold per band (single layer),
    # project away the sig columns, THEN chain the sm64 steps over the
    # compact (doc_id, f0..fB) table.
    mul_acc = (
        f"(((acc % 4294967296) * {_POLY_P}) + "
        f"((((acc // 4294967296) * {_POLY_P}) % 4294967296) * 4294967296)) "
        f"% 18446744073709551616"
    )
    fold_cols = []
    for bd in range(bands):
        seed_b = (bd * _GAMMA + _KIND_CAPTION) % _MOD64
        elems = ", ".join(f"CAST(s{bd * rows + j} AS HUGEINT)" for j in range(rows))
        fold_cols.append(
            f"CAST(list_reduce(list_prepend(CAST({seed_b} AS HUGEINT), [{elems}]), "
            f"(acc, x) -> ({mul_acc} + x) % 18446744073709551616) AS UBIGINT) AS f{bd}"
        )
    folds = f"(SELECT doc_id, {', '.join(fold_cols)} FROM {sig} sg)"
    steps: list[tuple[str, str]] = []
    for bd in range(bands):
        steps.extend(sm64_steps(f"f{bd}", f"k{bd}", f"b{bd}"))
    keyed = chain_select(f"SELECT * FROM {folds} fq", steps)
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
        WITH RECURSIVE bandrows AS MATERIALIZED (SELECT * FROM {bands_q} bq),
        grp AS MATERIALIZED (SELECT bk, min(doc_id) AS mn FROM bandrows GROUP BY bk),
        edge AS MATERIALIZED (
            SELECT DISTINCT g.mn AS u, b.doc_id AS v
            FROM bandrows b JOIN grp g USING (bk) WHERE b.doc_id <> g.mn
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
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
        WITH bands AS MATERIALIZED (SELECT * FROM {bands_q} bq),
        hits AS MATERIALIZED (
            SELECT DISTINCT w.doc_id
            FROM bands w JOIN bands c USING (bk)
            WHERE w.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        )
        SELECT d.doc_id FROM {table} d
        WHERE d.doc_id % 2 = 1 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
        ORDER BY d.doc_id
    """


def image_union_edges_cte(
    parquet_path: str,
    num_perm: int = 128,
    bands: int = 16,
    rows: int = 8,
    ngram: int = 5,
    seed: int = 42,
    phash_max_hamming: int = 3,
) -> str:
    """CTE body text (``imgs``, ``cbands``, ``edge``) for the flagship
    image+caption candidate graph over a persisted synthetic table
    (input_hint schema): caption LSH band-share pairs UNION pHash
    Hamming<=k pairs.  Valid because the engine's 4 pHash sub-bands recall
    every pair within Hamming<4 by pigeonhole and cross-payload reps are
    Hamming-verified (stages/candidates.py:117-150)."""
    cbands = lsh_bands_select(
        num_perm=num_perm,
        ngram=ngram,
        seed=seed,
        bands=bands,
        rows=rows,
        table="imgs",
        id_col="image_id",
        text_col="caption",
    )
    return f"""
        imgs AS MATERIALIZED (SELECT image_id, caption, phash FROM read_parquet('{parquet_path}')),
        cbands AS MATERIALIZED (SELECT doc_id AS image_id, bk FROM {cbands} cb),
        edge AS MATERIALIZED (
            SELECT DISTINCT a.image_id AS u, b.image_id AS v
            FROM cbands a JOIN cbands b ON a.bk = b.bk AND a.image_id < b.image_id
            UNION
            SELECT a.image_id AS u, b.image_id AS v
            FROM imgs a JOIN imgs b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.phash, b.phash)) <= {phash_max_hamming}
        )
    """


def node_hash_select(table_or_sub: str, id_col: str = "image_id") -> str:
    """Subquery producing ``(id_col, nh)`` where ``nh`` is the engine's
    surrogate NODE ID for string index columns —
    ``splitmix64(byte_poly(id))``, ``hashing.id_hash64_str_array`` /
    ``stages/signature.node_ids_for``.  This is what lets survivor-set
    oracles rank cluster members exactly as the union-find does (rep = min
    node id)."""
    inner = f"SELECT DISTINCT {id_col} AS __nid FROM {table_or_sub} __nh_in"
    q = chain_select(
        f"SELECT __nid, {poly_fold_expr('__nid')} AS h1 FROM ({inner}) __nh_src",
        sm64_steps("h1", "nh", "nhx"),
    )
    return f"(SELECT __nid AS {id_col}, nh FROM {q} __nhq)"


def _keep_by_min_node_hash(
    imgs_table: str, id_col: str, nh_sub: str
) -> str:
    """Tail CTEs + SELECT implementing the engine's merge semantics over a
    prepared ``sym`` edge CTE: a row survives iff no member of its component
    has a smaller node hash (``reach`` never contains (u, u), so strict
    ``<`` is the keeper test; singletons have no reach rows and survive)."""
    return f"""
        nh AS MATERIALIZED (SELECT * FROM {nh_sub} __n),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        mins AS (
            SELECT r.u AS {id_col}, min(b.nh) AS mn
            FROM reach r JOIN nh b ON b.{id_col} = r.v GROUP BY r.u
        )
        SELECT i.{id_col} FROM {imgs_table} i
        JOIN nh a USING ({id_col})
        LEFT JOIN mins m USING ({id_col})
        WHERE m.mn IS NULL OR a.nh < m.mn
        ORDER BY i.{id_col}
    """


def image_dedupe_keep_sql(parquet_path: str, **kw) -> str:
    """Survivor-set oracle for the flagship image+caption pipeline: the
    caption-band UNION pHash candidate graph, connected components, keep the
    min-NODE-HASH member of every component (plus singletons) — exactly
    ``MinHashDedupePipeline`` + ``merge_keep`` over the persisted synth
    table, end to end in DuckDB (node hash via ``node_hash_select``)."""
    edges = image_union_edges_cte(parquet_path, **kw)
    keep = _keep_by_min_node_hash("imgs", "image_id", node_hash_select("imgs"))
    return f"""
        WITH RECURSIVE {edges},
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        {keep}
    """


def image_dhash_keep_sql(
    parquet_path: str,
    max_hamming: int = 6,
    img_w: int = 32,
    img_h: int = 32,
) -> str:
    """Survivor-set oracle for pixel-side dHash near-dup dedupe: dHashes
    computed FROM THE RAW PPM BYTES in DuckDB (``dhash_select``), semantic
    Hamming<=k pair graph (== the engine's band-then-verify path by
    pigeonhole), connected components, keep min-node-hash members.
    Undecodable rows never enter the graph and always survive."""
    dh = dhash_select(parquet_path, img_w=img_w, img_h=img_h)
    all_ids = f"(SELECT image_id FROM read_parquet('{parquet_path}'))"
    keep = _keep_by_min_node_hash(
        f"{all_ids}", "image_id", node_hash_select(all_ids)
    )
    return f"""
        WITH RECURSIVE dhs AS MATERIALIZED (SELECT * FROM {dh} __d),
        edge AS MATERIALIZED (
            SELECT a.image_id AS u, b.image_id AS v
            FROM dhs a JOIN dhs b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.dh, b.dh)) <= {max_hamming}
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        {keep}
    """


def embed_ann_topk_sql(
    k: int = 10,
    query_doc: int = 0,
    dim: int = 128,
    embed_seed: int = 0x5EED,
    table: str = "documents",
) -> str:
    """Oracle for the embed->ANN composition: the feature-hashing embedder
    (same CTE pipeline as ``semantic_dedupe_sql``: signed unigram + 2-gram
    counts, L2-normalised, float32 storage) scored by exact cosine against
    ``query_doc``'s embedding, top-``k`` by (sim DESC, doc_id ASC), output
    the kept doc_ids sorted."""
    import numpy as np

    from .hashing import splitmix64 as _sm

    mix = _sm(np.arange(2, dtype=np.uint64) ^ np.uint64(embed_seed))
    toks = tokens_select(table)
    th = token_hash_select(toks)
    gram_fold = addmod64(mulmod64("a.tokh", _POLY_P), "b.tokh")
    grams = chain_select(
        f"SELECT a.doc_id, {gram_fold} AS gf FROM {th} a "
        f"JOIN {th} b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1",
        sm64_steps("gf", "gramh", "gr"),
    )
    feats = (
        f"(SELECT doc_id, xor(tokh, CAST({int(mix[0])} AS UBIGINT)) AS fx FROM {th} u "
        f"UNION ALL "
        f"SELECT doc_id, xor(gramh, CAST({int(mix[1])} AS UBIGINT)) AS fx FROM {grams} g)"
    )
    hashed = chain_select(f"SELECT * FROM {feats} f", sm64_steps("fx", "h", "fh"))
    return f"""
        WITH contrib AS MATERIALIZED (
            SELECT doc_id, CAST(h % {dim} AS INT) AS idx,
                   CASE WHEN (h >> 63) & 1 = 1 THEN -1.0 ELSE 1.0 END AS s
            FROM {hashed} q
        ),
        vec AS MATERIALIZED (
            SELECT doc_id, idx, CAST(sum(s) AS DOUBLE) AS val
            FROM contrib GROUP BY doc_id, idx HAVING sum(s) <> 0
        ),
        nrm AS MATERIALIZED (SELECT doc_id, sqrt(sum(val * val)) AS n1 FROM vec GROUP BY doc_id),
        v32 AS MATERIALIZED (
            SELECT v.doc_id, v.idx,
                   CAST(CAST(v.val / greatest(n.n1, 1e-12) AS FLOAT) AS DOUBLE) AS f
            FROM vec v JOIN nrm n USING (doc_id)
        ),
        n2 AS MATERIALIZED (SELECT doc_id, greatest(sqrt(sum(f * f)), 1e-12) AS nn FROM v32 GROUP BY doc_id),
        sims AS (
            SELECT a.doc_id,
                   sum(a.f * q.f) / (na.nn * nq.nn) AS sim
            FROM v32 a
            JOIN v32 q ON q.doc_id = {query_doc} AND q.idx = a.idx
            JOIN n2 na ON na.doc_id = a.doc_id
            JOIN n2 nq ON nq.doc_id = {query_doc}
            GROUP BY a.doc_id, na.nn, nq.nn
        )
        SELECT doc_id FROM (
            SELECT doc_id FROM sims ORDER BY sim DESC, doc_id ASC LIMIT {k}
        ) ORDER BY doc_id
    """


def corpus_assembly_sql(
    threshold: float = 0.7,
    num_perm: int = 64,
    ngram: int = 5,
    seed: int = 42,
    quality_q: float = 0.25,
    span_min_len: int = 30,
    table: str = "documents",
) -> str:
    """End-to-end oracle for ``pipelines.corpus.assemble_corpus``: the four
    stage oracles chained over one input — exact corpus-quantile quality
    gate, GROUP-BY-text exact dedupe, the full MinHash/LSH/CC survivor
    statement embedded as a derived table over the exact-dedupe survivors,
    and the ExactSubstr span reconstruction over the near-dedupe survivors.
    Checks the stage HAND-OFFS, not just each operator."""
    keep_stmt = minhash_cc_keep_sql(
        threshold, num_perm, ngram, seed, table="(SELECT doc_id, text FROM ed)"
    )
    g_max = span_min_len - 1
    return rf"""
        WITH tok AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
            FROM {table}
        ),
        qf AS (
            SELECT d.doc_id, d.text FROM {table} d JOIN tok USING (doc_id)
            WHERE tok.n_tokens >= (SELECT quantile_cont(n_tokens, {quality_q}) FROM tok)
        ),
        ed AS (
            SELECT doc_id, text FROM qf
            WHERE doc_id IN (SELECT min(doc_id) FROM qf GROUP BY text)
        ),
        nd AS (
            SELECT e.doc_id, e.text FROM ed e
            WHERE e.doc_id IN (SELECT doc_id FROM ({keep_stmt}) __keep)
        ),
        pos AS (
            SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM nd
        ),
        g AS (
            SELECT doc_id, i, substr(text, i, {span_min_len}) AS gram
            FROM pos WHERE i <= length(text) - {g_max}
        ),
        dir AS (
            SELECT gram, min(doc_id) AS m FROM g
            GROUP BY gram HAVING count(DISTINCT doc_id) > 1
        ),
        cuts AS (
            SELECT g.doc_id, g.i FROM g
            JOIN dir ON g.gram = dir.gram WHERE g.doc_id > dir.m
        ),
        cov AS (
            SELECT p.doc_id, p.i, substr(p.text, p.i, 1) AS ch,
                   count(c.i) > 0 AS covered
            FROM pos p LEFT JOIN cuts c
              ON c.doc_id = p.doc_id AND p.i >= c.i AND p.i < c.i + {span_min_len}
            GROUP BY p.doc_id, p.i, ch
        )
        SELECT doc_id,
               coalesce(string_agg(ch, '' ORDER BY i) FILTER (WHERE NOT covered),
                        '') AS text,
               count(*) FILTER (WHERE covered) AS n_spans_removed
        FROM cov GROUP BY doc_id ORDER BY doc_id
    """


def hll_distinct_sql(
    p: int = 12,
    group_col: str = "lang",
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """Oracle for ``functions.sketch.approx_distinct_per_group``: the FULL
    HyperLogLog pipeline rebuilt in DuckDB — token hashes, register
    index/rank (rank via exact integer ``strlen(bin(x))`` bit-length, no
    float log2), per-group max registers, and the Flajolet estimate.  The
    engine computes the indicator sum as the exact rational ``S / 2^Rmax``
    rounded to float64 once (``sketch.estimate``), which this reproduces
    with HUGEINT sums; the bias constant ``alpha*m*m`` is baked as the
    Python-computed float's shortest repr inside CAST(... AS DOUBLE) so
    DuckDB's DECIMAL literal parsing can't perturb it."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    amm = alpha * m * m  # engine evaluates alpha*m*m left-assoc; bake the result
    rank_cap = 64 - p + 1
    toks = tokens_select(table, id_col="doc_id", text_col=text_col)
    dh = chain_select(
        f"SELECT tok, {poly_fold_expr('tok')} AS h1 "
        f"FROM (SELECT DISTINCT tok FROM {toks} t) __ht",
        sm64_steps("h1", "tokh", "hh"),
    )
    rest = mulmod64("tokh", 1 << p)
    return f"""
        WITH pairs AS MATERIALIZED (
            SELECT DISTINCT d.{group_col} AS grp, t.tok
            FROM {toks} t JOIN {table} d USING (doc_id)
        ),
        ph AS MATERIALIZED (
            SELECT DISTINCT grp, tokh FROM pairs JOIN {dh} __dh USING (tok)
        ),
        ranked AS (
            SELECT grp, CAST(tokh >> {64 - p} AS BIGINT) AS idx,
                   {rest} AS rest
            FROM ph
        ),
        regs AS (
            SELECT grp, idx,
                   max(LEAST(64 - (CASE WHEN rest = 0 THEN 0
                                        ELSE strlen(bin(rest)) END) + 1,
                             {rank_cap})) AS reg
            FROM ranked GROUP BY grp, idx
        ),
        ga AS (
            SELECT grp, max(reg) AS rmax, count(*) AS npresent FROM regs GROUP BY grp
        ),
        s AS (
            SELECT r.grp, a.rmax, a.npresent,
                   sum(CAST(1 AS HUGEINT) << (a.rmax - r.reg))
                     + ({m} - a.npresent) * (CAST(1 AS HUGEINT) << a.rmax) AS s_int
            FROM regs r JOIN ga a USING (grp)
            GROUP BY r.grp, a.rmax, a.npresent
        ),
        est AS (
            SELECT grp,
                   CAST('{amm!r}' AS DOUBLE)
                     / (CAST(s_int AS DOUBLE)
                        / CAST(CAST(1 AS HUGEINT) << rmax AS DOUBLE)) AS e0,
                   {m} - npresent AS v
            FROM s
        )
        SELECT grp AS {group_col},
               CAST(round(CASE WHEN e0 <= 2.5 * {m} AND v > 0
                               THEN {m} * ln(CAST({m} AS DOUBLE) / v)
                               ELSE e0 END) AS BIGINT) AS n_distinct_approx
        FROM est ORDER BY grp
    """


def image_clusters_sql(parquet_path: str, **kw) -> str:
    """Cluster-assignment parity oracle for the flagship image+caption
    pipeline: connected components of the caption-band UNION pHash graph,
    each cluster reported as (its lexicographically smallest member, size).
    Representative *selection* inside the engine is by hashed node id
    (blake2b — not SQL-expressible), but the PARTITION into clusters is
    hash-independent, so this checks exactly the north-rule's 'cluster
    assignments match' at the driver's hash gate."""
    edges = image_union_edges_cte(parquet_path, **kw)
    return f"""
        WITH RECURSIVE {edges},
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        comp AS (
            SELECT i.image_id,
                   least(i.image_id, coalesce(min(r.v), i.image_id)) AS rep
            FROM imgs i LEFT JOIN reach r ON r.u = i.image_id
            GROUP BY i.image_id
        )
        SELECT rep AS cluster_rep, count(*) AS n_members
        FROM comp GROUP BY rep ORDER BY rep
    """


def image_wave_keep_sql(parquet_path: str, n_corpus: int, **kw) -> str:
    """Oracle for ``incremental_image_near_dedupe`` on the persisted synth
    table: rows [0, n_corpus) play the corpus, the rest the wave; a wave row
    is dropped iff it shares a caption band with any corpus row OR is within
    ``phash_max_hamming`` bits of any corpus pHash (the shared-sub-band
    precondition is implied by pigeonhole at 4 bands)."""
    kw.setdefault("phash_max_hamming", 3)
    ham = kw["phash_max_hamming"]
    cbands = lsh_bands_select(
        num_perm=kw.get("num_perm", 128),
        ngram=kw.get("ngram", 5),
        seed=kw.get("seed", 42),
        bands=kw.get("bands", 16),
        rows=kw.get("rows", 8),
        table="imgs",
        id_col="image_id",
        text_col="caption",
    )
    return f"""
        WITH imgs AS MATERIALIZED (
            SELECT image_id, caption, phash,
                   CAST(substr(image_id, 5) AS BIGINT) AS rid
            FROM read_parquet('{parquet_path}')
        ),
        cbands AS MATERIALIZED (SELECT doc_id AS image_id, bk FROM {cbands} cb),
        tagged AS MATERIALIZED (SELECT image_id, phash, rid < {n_corpus} AS is_corpus FROM imgs),
        hit AS MATERIALIZED (
            SELECT DISTINCT w.image_id
            FROM cbands wb JOIN tagged w ON w.image_id = wb.image_id AND NOT w.is_corpus
            JOIN cbands cb2 ON cb2.bk = wb.bk
            JOIN tagged c ON c.image_id = cb2.image_id AND c.is_corpus
            UNION
            SELECT DISTINCT w.image_id
            FROM tagged w JOIN tagged c
              ON NOT w.is_corpus AND c.is_corpus
             AND bit_count(xor(w.phash, c.phash)) <= {ham}
        )
        SELECT image_id FROM tagged
        WHERE NOT is_corpus AND image_id NOT IN (SELECT image_id FROM hit)
        ORDER BY image_id
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
        WITH RECURSIVE votes AS MATERIALIZED (
            SELECT doc_id, count(*) AS n, {s_cols} FROM {wide} w GROUP BY doc_id
        ),
        sh AS MATERIALIZED (
            SELECT d.doc_id, coalesce(({bit_sum}), 0) AS simhash
            FROM {table} d LEFT JOIN votes v ON d.doc_id = v.doc_id
        ),
        edge AS MATERIALIZED (
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


def semantic_dedupe_sql(
    threshold: float = 0.9,
    dim: int = 128,
    embed_seed: int = 0x5EED,
    table: str = "documents",
) -> str:
    """Oracle for ``functions.embed.semantic_dedupe``: the feature-hashing
    embedder (signed unigram + 2-gram counts, L2-normalised, float32
    storage), full cosine>=threshold pair graph, connected components, keep
    min-id representatives.  Float32 storage rounding is reproduced with
    ``CAST(... AS FLOAT)``; all similarity arithmetic is float64 on both
    sides (functions/similarity.py:27-44)."""
    import numpy as np

    from .hashing import splitmix64

    mix = splitmix64(np.arange(2, dtype=np.uint64) ^ np.uint64(embed_seed))
    toks = tokens_select(table)
    th = token_hash_select(toks)
    gram_fold = addmod64(mulmod64("a.tokh", _POLY_P), "b.tokh")
    grams = chain_select(
        f"SELECT a.doc_id, {gram_fold} AS gf FROM {th} a "
        f"JOIN {th} b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1",
        sm64_steps("gf", "gramh", "gr"),
    )
    feats = (
        f"(SELECT doc_id, xor(tokh, CAST({int(mix[0])} AS UBIGINT)) AS fx FROM {th} u "
        f"UNION ALL "
        f"SELECT doc_id, xor(gramh, CAST({int(mix[1])} AS UBIGINT)) AS fx FROM {grams} g)"
    )
    hashed = chain_select(f"SELECT * FROM {feats} f", sm64_steps("fx", "h", "fh"))
    return f"""
        WITH RECURSIVE contrib AS MATERIALIZED (
            SELECT doc_id, CAST(h % {dim} AS INT) AS idx,
                   CASE WHEN (h >> 63) & 1 = 1 THEN -1.0 ELSE 1.0 END AS s
            FROM {hashed} q
        ),
        vec AS MATERIALIZED (
            SELECT doc_id, idx, CAST(sum(s) AS DOUBLE) AS val
            FROM contrib GROUP BY doc_id, idx HAVING sum(s) <> 0
        ),
        nrm AS MATERIALIZED (SELECT doc_id, sqrt(sum(val * val)) AS n1 FROM vec GROUP BY doc_id),
        v32 AS MATERIALIZED (
            SELECT v.doc_id, v.idx,
                   CAST(CAST(v.val / greatest(n.n1, 1e-12) AS FLOAT) AS DOUBLE) AS f
            FROM vec v JOIN nrm n USING (doc_id)
        ),
        n2 AS MATERIALIZED (SELECT doc_id, greatest(sqrt(sum(f * f)), 1e-12) AS nn FROM v32 GROUP BY doc_id),
        dots AS MATERIALIZED (
            SELECT a.doc_id AS u, b.doc_id AS v, sum(a.f * b.f) AS dp
            FROM v32 a JOIN v32 b ON a.idx = b.idx AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        edge0 AS MATERIALIZED (
            SELECT d.u, d.v FROM dots d
            JOIN n2 na ON na.doc_id = d.u JOIN n2 nb ON nb.doc_id = d.v
            WHERE d.dp / (na.nn * nb.nn) >= {threshold}
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge0 UNION SELECT v, u FROM edge0),
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
        WITH drawn AS MATERIALIZED (
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
        parts AS MATERIALIZED (
            SELECT doc_id, n_tokens, CAST(h2p % {num_partitions} AS BIGINT) AS part
            FROM (SELECT * EXCLUDE (h1p) FROM {parted}) q
        ),
        laid AS MATERIALIZED (
            SELECT *, CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY part ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum,
                   min(doc_id) OVER (PARTITION BY part) AS part_min
            FROM parts
        ),
        spans AS MATERIALIZED (
            SELECT *, cum // {max_tokens} AS first_k,
                   CASE WHEN n_tokens > 0 THEN (cum + n_tokens - 1) // {max_tokens}
                        ELSE cum // {max_tokens} END AS last_k
            FROM laid
        ),
        frags0 AS MATERIALIZED (
            SELECT *, unnest(range(first_k, last_k + 1)) AS k FROM spans
        ),
        frags AS MATERIALIZED (
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
        keyed AS MATERIALIZED (SELECT * EXCLUDE (hbase) FROM {seqed}),
        texts AS MATERIALIZED (
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


def image_stats_sql(parquet_path: str) -> str:
    """Decoded-pixel parity oracle for ``functions.multimodal.ImageDecodeStage``:
    parses the P6 PPM payload *inside DuckDB* (hex() the blob, skip the
    'P6\\n{w} {h}\\n255\\n' header, convert 8 raw bytes per 16-hex-char chunk
    via '0x'||substr cast, extract bytes with shift/mask) and emits the exact
    integer pixel moments px_sum / px_sumsq.  A ragged tail chunk is safe:
    the cast right-aligns, the high bytes are zero, and both moments are
    position-independent.  Bit-exact vs the engine's numpy decode."""
    bsum = " + ".join(f"((x >> {8 * k}) & 255)" for k in range(8))
    bsq = " + ".join(f"(((x >> {8 * k}) & 255) * ((x >> {8 * k}) & 255))" for k in range(8))
    return f"""
        WITH src AS MATERIALIZED (
            SELECT image_id, hex("bytes") AS hx,
                   3 + strlen(CAST(w AS VARCHAR)) + 1
                     + strlen(CAST(h AS VARCHAR)) + 1 + 4 AS hdr,
                   w * h * 3 AS nb
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'ppm' AND "bytes" IS NOT NULL
        ),
        chunks AS (
            SELECT image_id,
                   CAST('0x' || substring(hx, CAST(1 + 2 * hdr + 16 * j AS BIGINT), 16)
                        AS UBIGINT) AS x
            FROM src, unnest(range((nb + 7) // 8)) AS u(j)
        )
        SELECT image_id,
               CAST(sum({bsum}) AS BIGINT) AS px_sum,
               CAST(sum({bsq}) AS BIGINT) AS px_sumsq
        FROM chunks GROUP BY image_id ORDER BY image_id
    """


def image_invariants_sql(
    parquet_path: str, bits: int = 2, threshold_db: float = 40.0
) -> str:
    """Oracle for ``functions.validate.verify_row_invariants`` run against a
    :class:`functions.multimodal.RequantizeStage(bits)` copy of the same
    table.  Requantizing masks the low ``bits`` of every pixel byte, so the
    per-pixel diff is exactly ``p & ((1<<bits)-1)`` — the oracle decodes the
    ORIGINAL P6 PPM blob in DuckDB (same hex-chunk machinery as
    :func:`image_stats_sql`) and sums the squared masked bytes analytically,
    while the engine decodes both blobs and diffs them; the integer ``sse``
    and the cross-multiplied ``psnr_ok`` verdict must agree bit-for-bit.
    Zero-padded tail-chunk bytes contribute ``(0 & mask)^2 = 0``, so the
    ragged tail is safe (position-independent sum)."""
    thr = 10.0 ** (threshold_db / 10.0)
    assert abs(thr - round(thr)) < 1e-9, "threshold must make 10^(T/10) integral"
    thr_int = int(round(thr))
    mask = (1 << bits) - 1
    terms = " + ".join(
        f"(((x >> {8 * k}) & {mask}) * ((x >> {8 * k}) & {mask}))" for k in range(8)
    )
    return f"""
        WITH src AS MATERIALIZED (
            SELECT image_id, hex("bytes") AS hx,
                   3 + strlen(CAST(w AS VARCHAR)) + 1
                     + strlen(CAST(h AS VARCHAR)) + 1 + 4 AS hdr,
                   w * h * 3 AS nb
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'ppm' AND "bytes" IS NOT NULL
        ),
        chunks AS (
            SELECT image_id,
                   CAST('0x' || substring(hx, CAST(1 + 2 * hdr + 16 * j AS BIGINT), 16)
                        AS UBIGINT) AS x
            FROM src, unnest(range((nb + 7) // 8)) AS u(j)
        ),
        s AS (
            SELECT image_id, CAST(sum({terms}) AS BIGINT) AS sse
            FROM chunks GROUP BY image_id
        )
        SELECT src.image_id,
               CAST(src.nb AS BIGINT) AS n_px,
               s.sse AS sse,
               TRUE AS caption_equal,
               (s.sse = 0 OR 65025 * CAST(src.nb AS BIGINT) >= s.sse * {thr_int})
                   AS psnr_ok
        FROM src JOIN s USING (image_id) ORDER BY src.image_id
    """


def content_keys_select(table: str, seed: int) -> str:
    """Subquery producing ``(doc_id, key)`` — the engine's
    ``hashing.content_keys`` value: ``splitmix64(seed ^ (sum_i
    splitmix64(tokh_i ^ i) mod 2**64))`` with i the 0-based token position;
    empty docs key to ``splitmix64(seed)``."""
    toks = token_hash_select(tokens_select(table))
    mixed = chain_select(
        f"SELECT doc_id, tokh, pos FROM {toks} __t",
        sm64_steps("xor(tokh, CAST(pos - 1 AS UBIGINT))", "m", "sp"),
    )
    keyed = chain_select(
        f"""SELECT d.doc_id, coalesce(s.tsum, CAST(0 AS UBIGINT)) AS tsum
            FROM {table} d LEFT JOIN (
                SELECT doc_id,
                       CAST(sum(CAST(m AS HUGEINT)) % 18446744073709551616 AS UBIGINT) AS tsum
                FROM {mixed} __m GROUP BY doc_id
            ) s USING (doc_id)""",
        sm64_steps(f"xor(tsum, CAST({seed} AS UBIGINT))", "key", "sk"),
    )
    return f"(SELECT doc_id, key FROM {keyed} __ck)"


def doc_fingerprints_sql(table: str = "documents") -> str:
    """Oracle for the ``doc_fingerprints`` query: ``fingerprint`` is the
    content key (``content_keys_select`` at seed 0) and ``doc_fingerprint``
    the min over splitmix64-mixed 1-gram shingle hashes (0 for empty docs)
    — both reinterpreted as signed i64 to match the driver comparator's
    uint64 -> int64 cast of the engine output."""
    ck = content_keys_select(table, 0)
    sh = shingles_select(tokens_select(table), 1)
    mixed = chain_select(f"SELECT doc_id, sh FROM {sh} __s", sm64_steps("sh", "m", "fp"))
    return f"""
        WITH ck AS MATERIALIZED (SELECT * FROM {ck} __c),
        mins AS MATERIALIZED (
            SELECT doc_id, min(m) AS mn FROM {mixed} __m GROUP BY doc_id
        )
        SELECT ck.doc_id, {signed64("ck.key")} AS fingerprint,
               {signed64("coalesce(mins.mn, CAST(0 AS UBIGINT))")} AS doc_fingerprint
        FROM ck LEFT JOIN mins USING (doc_id) ORDER BY ck.doc_id
    """


def split_docs_sql(
    fractions: dict[str, float] | None = None,
    seed: int = 0x5917,
    table: str = "documents",
) -> str:
    """Oracle for ``functions.textops.assign_splits``: the content key is
    ``splitmix64(seed ^ (sum_i splitmix64(tokh_i ^ i) mod 2**64))`` (i =
    0-based token position), mapped onto the cumulative-fraction edges with
    the engine's exact float64 semantics (u64 -> DOUBLE cast, then
    ``searchsorted(side='right')`` == a ``hf < edge`` CASE ladder; the edge
    constants are baked at full repr precision)."""
    import numpy as np

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(fractions)
    edges = (np.cumsum([fractions[n] for n in names]) * float(2**64)).astype(np.float64)
    keyed = content_keys_select(table, seed)
    ladder = " ".join(
        f"WHEN CAST(key AS DOUBLE) < {e!r} THEN '{n}'"
        for n, e in zip(names[:-1], edges[:-1])
    )
    return f"""
        SELECT doc_id, CASE {ladder} ELSE '{names[-1]}' END AS split
        FROM {keyed} __k ORDER BY doc_id
    """


def audio_stats_sql(parquet_path: str) -> str:
    """Decoded-sample parity oracle for ``functions.audio.AudioFeatureStage``:
    parses the RIFF/WAVE PCM16 payload *inside DuckDB* — locate the 'data'
    chunk tag in hex ('64617461'), read its little-endian u32 size, then
    convert 8 raw bytes per 16-hex-char chunk and extract 4 LE int16 samples
    via shift/mask + sign fold — and emits the exact integer sample moments
    n_samples / sample_sum / sample_sumsq.  Tail chunks are rpad'ed with
    zero bytes (zero-valued samples contribute nothing to either moment).
    Non-wav / null payloads carry zero moments, matching the engine's
    decode_ok=false rows."""

    def _byte(j: int) -> str:
        return f"((x >> {8 * (7 - j)}) & 255)"

    samp = []
    for m in range(4):
        u = f"CAST({_byte(2 * m)} + 256*{_byte(2 * m + 1)} AS BIGINT)"
        samp.append(f"(CASE WHEN {u} >= 32768 THEN {u} - 65536 ELSE {u} END)")
    ssum = " + ".join(samp)
    ssq = " + ".join(f"({e})*({e})" for e in samp)
    return f"""
        WITH audio_src AS MATERIALIZED (
            SELECT audio_id, hex("bytes") AS hx,
                   position('64617461' IN hex("bytes")) AS dpos
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'wav' AND "bytes" IS NOT NULL
        ),
        sized AS MATERIALIZED (
            SELECT audio_id, hx, dpos,
                   CAST('0x' || substring(hx, dpos + 8, 8) AS UBIGINT) AS szbe
            FROM audio_src WHERE dpos > 0
        ),
        nb_t AS MATERIALIZED (
            SELECT audio_id, hx, dpos,
                   CAST(((szbe >> 24) & 255) + 256*((szbe >> 16) & 255)
                        + 65536*((szbe >> 8) & 255)
                        + 16777216*(szbe & 255) AS BIGINT) AS nb
            FROM sized
        ),
        chunks AS (
            SELECT audio_id, nb,
                   CAST('0x' || rpad(substring(hx,
                        CAST(dpos + 16 + 16*j AS BIGINT), 16), 16, '0')
                        AS UBIGINT) AS x
            FROM nb_t, unnest(range((nb + 7) // 8)) AS u(j)
        ),
        moms AS (
            SELECT audio_id, CAST(max(nb) // 2 AS BIGINT) AS n_samples,
                   CAST(sum({ssum}) AS BIGINT) AS sample_sum,
                   CAST(sum({ssq}) AS BIGINT) AS sample_sumsq
            FROM chunks GROUP BY audio_id
        )
        SELECT a.audio_id, coalesce(m.n_samples, 0) AS n_samples,
               coalesce(m.sample_sum, 0) AS sample_sum,
               coalesce(m.sample_sumsq, 0) AS sample_sumsq
        FROM read_parquet('{parquet_path}') a
        LEFT JOIN moms m USING (audio_id) ORDER BY a.audio_id
    """


def audio_fingerprint_select(parquet_path: str) -> str:
    """Subquery producing ``(audio_id, afp)`` — the engine's integer audio
    fingerprint (``functions.audio.audio_fingerprints64_int``) recomputed
    from the raw RIFF/PCM16 payload entirely in DuckDB: positional sample
    decode (rpad'ed tail — zero samples contribute nothing to a
    correlation), square-wave in-phase/quadrature correlations per baked
    period, HUGEINT energies a^2+b^2, and exact ``e[j+1] > e[j]`` bit packs.
    The period/offset constants, the FP_WINDOW truncation, and the centered
    chunk-aligned window start (``audio.fp_window_start`` — pure arithmetic
    on the payload byte count) are baked from the shared definitions."""
    from .functions.audio import FP_WINDOW, fingerprint_periods

    ps = fingerprint_periods()
    bands = ", ".join(f"({j}, {int(p)}, {int(p) // 4})" for j, p in enumerate(ps))

    def _byte(j: int) -> str:
        return f"((x >> {8 * (7 - j)}) & 255)"

    vals = []
    for m in range(4):
        u = f"CAST({_byte(2 * m)} + 256*{_byte(2 * m + 1)} AS BIGINT)"
        vals.append(f"(CASE WHEN {u} >= 32768 THEN {u} - 65536 ELSE {u} END)")
    val_case = " ".join(f"WHEN {m} THEN {v}" for m, v in enumerate(vals))
    max_chunks = FP_WINDOW // 4  # 4 samples per 8-byte chunk
    return f"""
        (WITH __af_src AS MATERIALIZED (
            SELECT audio_id, hex("bytes") AS hx,
                   position('64617461' IN hex("bytes")) AS dpos
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'wav' AND "bytes" IS NOT NULL
        ),
        __af_sized AS MATERIALIZED (
            SELECT audio_id, hx, dpos,
                   CAST('0x' || substring(hx, dpos + 8, 8) AS UBIGINT) AS szbe
            FROM __af_src WHERE dpos > 0
        ),
        __af_nb AS MATERIALIZED (
            SELECT audio_id, hx, dpos, nb,
                   -- centered chunk-aligned window start (in chunks):
                   -- fp_window_start(nb // 2) / 4
                   (greatest(nb // 2 - {FP_WINDOW}, 0) // 2) // 4 AS sc
            FROM (
                SELECT audio_id, hx, dpos,
                       CAST(((szbe >> 24) & 255) + 256*((szbe >> 16) & 255)
                            + 65536*((szbe >> 8) & 255)
                            + 16777216*(szbe & 255) AS BIGINT) AS nb
                FROM __af_sized
            ) __af_nb0
            WHERE nb >= 8
        ),
        __af_samp AS MATERIALIZED (
            SELECT audio_id, CAST(4*j + m - 4*sc AS BIGINT) AS n,
                   (CASE m {val_case} END) AS val
            FROM (
                SELECT audio_id, sc, j,
                       CAST('0x' || rpad(substring(hx,
                            CAST(dpos + 16 + 16*j AS BIGINT), 16), 16, '0')
                            AS UBIGINT) AS x
                FROM __af_nb,
                     unnest(range(sc, least((nb + 7) // 8, sc + {max_chunks})))
                         AS u(j)
            ) __af_ch, unnest(range(4)) AS mm(m)
        ),
        __af_corr AS MATERIALIZED (
            SELECT s.audio_id, b.j AS bj,
                   sum(s.val * (CASE WHEN (s.n % b.p)*2 < b.p
                                THEN 1 ELSE -1 END)) AS ca,
                   sum(s.val * (CASE WHEN ((s.n + b.q) % b.p)*2 < b.p
                                THEN 1 ELSE -1 END)) AS cb
            FROM __af_samp s,
                 (SELECT * FROM (VALUES {bands}) AS t(j, p, q)) b
            GROUP BY s.audio_id, b.j
        ),
        __af_en AS MATERIALIZED (
            SELECT audio_id, bj,
                   CAST(ca AS HUGEINT)*CAST(ca AS HUGEINT)
                   + CAST(cb AS HUGEINT)*CAST(cb AS HUGEINT) AS e
            FROM __af_corr
        )
        SELECT l.audio_id,
               CAST(sum(CASE WHEN r.e > l.e
                        THEN CAST(1 AS HUGEINT) << l.bj
                        ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS afp
        FROM __af_en l JOIN __af_en r
          ON l.audio_id = r.audio_id AND r.bj = l.bj + 1
        WHERE l.bj < 64
        GROUP BY l.audio_id)
    """


def audio_dedupe_keep_sql(parquet_path: str, max_hamming: int = 3) -> str:
    """Survivor-set oracle for ``audio_dedupe_candidates`` + cluster +
    ``merge_keep``: integer fingerprints recomputed from the raw payload
    (``audio_fingerprint_select``), Hamming<=k pair graph (== the engine's
    4-sub-band band-then-verify path by pigeonhole, exactly as argued for
    ``image_dhash_keep_sql``), connected components, keep the min-audio_id
    member of each component (integer ids ARE the union-find node ids).
    Undecodable / <4-sample rows never enter the graph and always survive."""
    fp = audio_fingerprint_select(parquet_path)
    return f"""
        WITH RECURSIVE afps AS MATERIALIZED (SELECT * FROM {fp} __a),
        edge AS MATERIALIZED (
            SELECT a.audio_id AS u, b.audio_id AS v
            FROM afps a JOIN afps b ON a.audio_id < b.audio_id
            WHERE bit_count(xor(a.afp, b.afp)) <= {max_hamming}
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        mins AS (
            SELECT r.u AS audio_id, min(r.v) AS mn FROM reach r GROUP BY r.u
        )
        SELECT a.audio_id
        FROM read_parquet('{parquet_path}') a
        LEFT JOIN mins m USING (audio_id)
        WHERE m.mn IS NULL OR a.audio_id < m.mn
        ORDER BY a.audio_id
    """


def dhash_select(parquet_path: str, img_w: int = 32, img_h: int = 32) -> str:
    """Subquery producing ``(image_id, dh)`` — the engine's
    ``multimodal.dhash64`` over the P6 PPM payload, computed entirely in
    DuckDB: decode bytes via the hex-chunk trick, integer RGB block sums on
    the baked (h -> 9 rows, w -> 10 cols) linspace grid, then the
    cross-multiplied exact block-mean comparisons packed MSB-first.  The
    grid constants are baked for (img_w, img_h), the synth table's fixed
    dims."""
    import numpy as np

    yi = np.linspace(0, img_h, 9).astype(int)
    xi = np.linspace(0, img_w, 10).astype(int)
    yw, xw = np.diff(yi), np.diff(xi)
    assert (yw > 0).all() and (xw > 0).all(), "image too small for an 8x9 grid"

    def ladder(bounds, var: str) -> str:
        cl = " ".join(
            f"WHEN {var} < {int(bounds[i + 1])} THEN {i}" for i in range(len(bounds) - 2)
        )
        return f"(CASE {cl} ELSE {len(bounds) - 2} END)"

    by_expr = ladder(yi, f"((bidx // 3) // {img_w})")
    bx_expr = ladder(xi, f"((bidx // 3) % {img_w})")
    # cross-multiplied comparison S_l * area_r > S_r * area_l; the y-extent
    # is identical for both sides of a row comparison, so only x-widths
    # remain
    xw_r = " ".join(f"WHEN {c} THEN {int(xw[c + 1])}" for c in range(8))
    xw_l = " ".join(f"WHEN {c} THEN {int(xw[c])}" for c in range(8))
    return f"""
        (WITH __dh_src AS MATERIALIZED (
            SELECT image_id, hex("bytes") AS hx,
                   3 + strlen(CAST(w AS VARCHAR)) + 1
                     + strlen(CAST(h AS VARCHAR)) + 1 + 4 AS hdr,
                   w * h * 3 AS nb
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'ppm' AND "bytes" IS NOT NULL
        ),
        __dh_chunks AS (
            SELECT image_id, nb, j,
                   CAST('0x' || substring(hx, CAST(1 + 2*hdr + 16*j AS BIGINT), 16)
                        AS UBIGINT) AS x
            FROM __dh_src, unnest(range((nb + 7) // 8)) AS u(j)
        ),
        __dh_pix AS (
            SELECT image_id, CAST(8*j + k AS BIGINT) AS bidx,
                   CAST((x >> CAST(8*(7 - k) AS UBIGINT)) & 255 AS BIGINT) AS val, nb
            FROM __dh_chunks, unnest(range(8)) AS kk(k)
            WHERE 8*j + k < nb
        ),
        __dh_blocks AS MATERIALIZED (
            SELECT image_id, {by_expr} AS by, {bx_expr} AS bx, sum(val) AS s
            FROM __dh_pix GROUP BY 1, 2, 3
        ),
        __dh_cmp AS (
            SELECT l.image_id, l.by, l.bx AS c,
                   CASE WHEN l.s * (CASE l.bx {xw_r} END)
                         > r.s * (CASE l.bx {xw_l} END)
                        THEN 1 ELSE 0 END AS bit
            FROM __dh_blocks l JOIN __dh_blocks r
              ON l.image_id = r.image_id AND l.by = r.by AND r.bx = l.bx + 1
            WHERE l.bx < 8
        )
        SELECT image_id,
               CAST(sum(CAST(bit AS HUGEINT)
                        * (CAST(1 AS HUGEINT) << (63 - (by*8 + c)))) AS UBIGINT) AS dh
        FROM __dh_cmp GROUP BY image_id)
    """


def image_dhash_clusters_sql(
    parquet_path: str,
    max_hamming: int = 6,
    img_w: int = 32,
    img_h: int = 32,
) -> str:
    """Cluster-assignment parity oracle for pixel-side dHash near-dup
    dedupe: connected components of the Hamming<=k pair graph over dHashes
    computed FROM THE RAW PPM BYTES inside DuckDB, each cluster reported as
    (lexicographically smallest member, size).  Valid vs the engine's
    band-then-verify path by pigeonhole: k < phash_bands flipped bits always
    leave an intact band, so banding + Hamming verification == the semantic
    Hamming<=k graph."""
    dh = dhash_select(parquet_path, img_w=img_w, img_h=img_h)
    return f"""
        WITH RECURSIVE dhs AS MATERIALIZED (SELECT * FROM {dh} __d),
        edge AS MATERIALIZED (
            SELECT a.image_id AS u, b.image_id AS v
            FROM dhs a JOIN dhs b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.dh, b.dh)) <= {max_hamming}
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        comp AS (
            SELECT i.image_id,
                   least(i.image_id, coalesce(min(r.v), i.image_id)) AS rep
            FROM dhs i LEFT JOIN reach r ON r.u = i.image_id
            GROUP BY i.image_id
        )
        SELECT rep AS cluster_rep, count(*) AS n_members
        FROM comp GROUP BY rep ORDER BY rep
    """


def cdc_stats_sql(parquet_path: str, mask_bits: int = 11, id_col: str = "image_id") -> str:
    """Oracle for ``functions.cdc.cdc_dedupe_stats``: the gear-hash CDC
    chunker reproduced inside DuckDB.  Key reduction: a cut tests
    ``h & (2**mask_bits - 1) == 0``, and every rolling-hash term shifted by
    ``t >= mask_bits`` vanishes mod ``2**mask_bits`` — so only the low
    ``mask_bits`` gear bits and ``mask_bits`` window lags are needed (11
    instead of 64).  Candidates within 64 bytes of a row start are dropped
    (the engine's window-crossing guard), row ends always cut, and chunk
    identity is the literal content (hex substring) — strictly stronger
    than the engine's blake2b-64 equality proxy, same partition.  Valid
    while every payload is <= max_chunk (8192 — the synth blobs are ~3KB),
    where the engine's oversized-gap splitting can never trigger."""
    import numpy as np

    from .hashing import splitmix64 as _sm  # engine gear table, low bits

    gear = _sm(np.arange(256, dtype=np.uint64) ^ np.uint64(0x9E3779B97F4A7C15))
    g11 = (gear & np.uint64((1 << mask_bits) - 1)).astype(np.int64)
    gear_vals = ", ".join(f"({i}, {int(g11[i])})" for i in range(256))
    mod = 1 << mask_bits
    terms = []
    for t in range(mask_bits):
        lagv = "g" if t == 0 else f"lag(g, {t}) OVER w"
        terms.append(f"(({lagv} * {1 << t}) % {mod})")
    hsum = " + ".join(terms)
    return f"""
        WITH cdc_src AS MATERIALIZED (
            SELECT {id_col} AS rid, hex("bytes") AS hx,
                   strlen(hex("bytes")) // 2 AS nb
            FROM read_parquet('{parquet_path}') WHERE "bytes" IS NOT NULL
        ),
        c8 AS (
            SELECT rid, nb, j, hx,
                   CAST('0x' || rpad(substring(hx, CAST(1 + 16*j AS BIGINT), 16),
                                     16, '0') AS UBIGINT) AS x
            FROM cdc_src, unnest(range((nb + 7) // 8)) AS u(j)
        ),
        byts AS (
            SELECT rid, CAST(8*j + k AS BIGINT) AS bidx,
                   CAST((x >> CAST(8*(7 - k) AS UBIGINT)) & 255 AS BIGINT) AS b, nb
            FROM c8, unnest(range(8)) AS kk(k)
            WHERE 8*j + k < nb
        ),
        gv AS (
            SELECT rid, bidx, nb, gt.g
            FROM byts JOIN (VALUES {gear_vals}) AS gt(b, g) USING (b)
        ),
        cands AS (
            SELECT rid, bidx + 1 AS e, nb, ({hsum}) % {mod} AS hlow
            FROM gv WINDOW w AS (PARTITION BY rid ORDER BY bidx)
        ),
        cuts AS (
            SELECT rid, e FROM cands WHERE hlow = 0 AND e >= 64 AND e < nb
            UNION ALL
            SELECT rid, nb AS e FROM cdc_src WHERE nb > 0
        ),
        spans AS (
            SELECT c.rid,
                   coalesce(lag(c.e) OVER (PARTITION BY c.rid ORDER BY c.e), 0) AS s,
                   c.e
            FROM cuts c
        ),
        cdc_chunks AS MATERIALIZED (
            SELECT sp.rid, sp.e - sp.s AS clen,
                   substring(src.hx, CAST(1 + 2*sp.s AS BIGINT),
                             CAST(2*(sp.e - sp.s) AS BIGINT)) AS content
            FROM spans sp JOIN cdc_src src ON sp.rid = src.rid
        ),
        uniq AS (
            SELECT content, min(clen) AS clen, count(*) AS n
            FROM cdc_chunks GROUP BY content
        )
        SELECT CAST(sum(clen * n) AS BIGINT) AS total_bytes,
               CAST(sum(n) AS BIGINT) AS total_chunks,
               CAST(count(*) AS BIGINT) AS unique_chunks,
               CAST(sum(clen) AS BIGINT) AS unique_bytes,
               round(CAST(sum(clen) AS DOUBLE)
                     / greatest(CAST(sum(clen * n) AS BIGINT), 1), 6) AS dedup_ratio
        FROM uniq
    """


def video_frame_dhash_select(
    parquet_path: str, frame_w: int, frame_h: int, id_col: str = "video_id"
) -> str:
    """Subquery producing ``(video_id, fidx, dh)`` — the engine's per-frame
    ``dhash64`` over the rawv payload, computed inside DuckDB: the body
    starts after the first newline (hex '0A'; the ASCII header cannot
    alias it mid-byte — no header byte is 0x?0 followed by 0xA?), each
    frame is ``frame_w*frame_h*3`` bytes, and the block grid / exact
    cross-multiplied comparisons mirror ``dhash_select``.  Non-rawv / null
    payloads emit nothing."""
    import numpy as np

    fb = frame_w * frame_h * 3
    yi = np.linspace(0, frame_h, 9).astype(int)
    xi = np.linspace(0, frame_w, 10).astype(int)
    assert (np.diff(yi) > 0).all() and (np.diff(xi) > 0).all(), "frame too small"
    xw = np.diff(xi)

    def ladder(bounds, var: str) -> str:
        cl = " ".join(
            f"WHEN {var} < {int(bounds[i + 1])} THEN {i}" for i in range(len(bounds) - 2)
        )
        return f"(CASE {cl} ELSE {len(bounds) - 2} END)"

    by_expr = ladder(yi, f"(((bidx % {fb}) // 3) // {frame_w})")
    bx_expr = ladder(xi, f"(((bidx % {fb}) // 3) % {frame_w})")
    xw_r = " ".join(f"WHEN {c} THEN {int(xw[c + 1])}" for c in range(8))
    xw_l = " ".join(f"WHEN {c} THEN {int(xw[c])}" for c in range(8))
    return f"""
        (WITH __vd_src AS MATERIALIZED (
            SELECT {id_col} AS video_id, hex("bytes") AS hx,
                   (position('0A' IN hex("bytes")) + 1) // 2 AS bstart,
                   strlen(hex("bytes")) // 2 AS ntot
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'rawv' AND "bytes" IS NOT NULL
        ),
        __vd_chunks AS (
            SELECT video_id, ntot - bstart AS nb, j,
                   CAST('0x' || rpad(substring(hx, CAST(1 + 2*bstart + 16*j AS BIGINT), 16),
                                     16, '0') AS UBIGINT) AS x
            FROM __vd_src, unnest(range((ntot - bstart + 7) // 8)) AS u(j)
        ),
        __vd_pix AS (
            SELECT video_id, CAST(8*j + k AS BIGINT) AS bidx,
                   CAST((x >> CAST(8*(7 - k) AS UBIGINT)) & 255 AS BIGINT) AS val, nb
            FROM __vd_chunks, unnest(range(8)) AS kk(k)
            WHERE 8*j + k < nb
        ),
        __vd_blocks AS MATERIALIZED (
            SELECT video_id, bidx // {fb} AS fidx,
                   {by_expr} AS by, {bx_expr} AS bx, sum(val) AS s
            FROM __vd_pix GROUP BY 1, 2, 3, 4
        ),
        __vd_cmp AS (
            SELECT l.video_id, l.fidx, l.by, l.bx AS c,
                   CASE WHEN l.s * (CASE l.bx {xw_r} END)
                         > r.s * (CASE l.bx {xw_l} END)
                        THEN 1 ELSE 0 END AS bit
            FROM __vd_blocks l JOIN __vd_blocks r
              ON l.video_id = r.video_id AND l.fidx = r.fidx
                 AND l.by = r.by AND r.bx = l.bx + 1
            WHERE l.bx < 8
        )
        SELECT video_id, fidx,
               CAST(sum(CAST(bit AS HUGEINT)
                        * (CAST(1 AS HUGEINT) << (63 - (by*8 + c)))) AS UBIGINT) AS dh
        FROM __vd_cmp GROUP BY video_id, fidx)
    """


def video_keep_sql(
    parquet_path: str,
    frame_w: int,
    frame_h: int,
    threshold: float = 0.2,
    num_perm: int = 64,
    seed: int = 42,
    id_col: str = "video_id",
) -> str:
    """Oracle for ``functions.video.video_dedupe`` (every_n=1, 1-gram
    temporal shingles): per-frame dHashes computed FROM THE RAW rawv BYTES,
    shingles = distinct ``splitmix64(dh) >> 32`` per video, the engine's
    seeded MinHash/LSH banding (``bands_from_shingles_select``), band-share
    edges, recursive-CTE connected components, survivor = min video_id per
    component (the union-find rep IS the min u64 node id, and integer ids
    hash to themselves).  Videos with no frames (non-rawv, null) emit no
    bands and are always kept."""
    from .config import optimal_param

    bands, rows = optimal_param(threshold, num_perm)
    dhs = video_frame_dhash_select(parquet_path, frame_w, frame_h, id_col=id_col)
    sh_mixed = chain_select(
        f"SELECT video_id, dh FROM {dhs} __v", sm64_steps("dh", "m", "vs")
    )
    shingles = (
        f"(SELECT DISTINCT video_id AS doc_id, (m >> 32) AS sh FROM {sh_mixed} __m)"
    )
    # the engine draws make_permutations(bands*rows) — when optimal_param
    # uses fewer than num_perm permutations (b*r <= num_perm search), the
    # constant stream differs from a num_perm draw, so bake exactly b*r
    bandq = bands_from_shingles_select(shingles, bands * rows, bands, rows, seed)
    return f"""
        WITH RECURSIVE vbands AS MATERIALIZED (SELECT * FROM {bandq} bq),
        edge AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
            FROM vbands a JOIN vbands b ON a.bk = b.bk AND a.doc_id < b.doc_id
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        rep AS (
            SELECT u, least(u, min(v)) AS rep FROM reach GROUP BY u
        )
        SELECT t.{id_col} AS video_id FROM read_parquet('{parquet_path}') t
        WHERE t.{id_col} NOT IN (SELECT u FROM rep WHERE u <> rep)
        ORDER BY video_id
    """


def bm25_topk_sql(
    n_queries: int = 4,
    query_len: int = 6,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """Oracle for ``functions.retrieval.bm25_topk``: the classic BM25
    ranking recomputed in DuckDB over the same whitespace tokenization
    (``tokens_select`` / ``token_hash_select`` — the engine's
    ``token_hashes_flat`` values).  Float parity follows the lm_quality
    precedent: every arithmetic step mirrors the engine's float64
    association order exactly (constants emitted via ``repr`` so both
    runtimes parse identical doubles), per-term contributions are summed in
    first-occurrence term-rank order via an explicit left-associative
    pivot, scores are rounded to 6 decimals, and ties break on doc id."""
    toks = token_hash_select(tokens_select(table))
    # explicit left-assoc sum over term ranks 1..query_len (missing ranks
    # contribute exact 0.0, matching the engine's zero tf contributions)
    arms = " + ".join(
        f"coalesce(max(CASE WHEN r = {r} THEN c END), 0.0)"
        for r in range(1, query_len + 1)
    )
    return f"""
        WITH toks AS MATERIALIZED (SELECT * FROM {toks} __t),
        qdocs AS (SELECT doc_id FROM {table} ORDER BY doc_id LIMIT {n_queries}),
        qterm0 AS (
            SELECT t.doc_id AS query_id, t.tokh, min(t.pos) AS fp
            FROM toks t JOIN qdocs q ON q.doc_id = t.doc_id
            WHERE t.pos <= {query_len}
            GROUP BY 1, 2
        ),
        qterms AS (
            SELECT query_id, tokh,
                   row_number() OVER (PARTITION BY query_id ORDER BY fp) AS r
            FROM qterm0
        ),
        stats AS (SELECT count(*) AS n FROM {table}),
        dl AS MATERIALIZED (
            SELECT d.doc_id, coalesce(c.c, 0) AS dl
            FROM {table} d LEFT JOIN
                 (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) c USING (doc_id)
        ),
        avg AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST((SELECT n FROM stats) AS DOUBLE) AS avgdl FROM dl),
        tf AS MATERIALIZED (
            SELECT t.doc_id, t.tokh, count(*) AS tf
            FROM toks t WHERE t.tokh IN (SELECT DISTINCT tokh FROM qterms)
            GROUP BY 1, 2
        ),
        idf AS (
            SELECT tokh,
                   ln((CAST((SELECT n FROM stats) AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5) + 1.0) AS idf
            FROM (SELECT tokh, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1) __df
        ),
        contrib AS (
            SELECT q.query_id, f.doc_id, q.r,
                   i.idf * (CAST(f.tf AS DOUBLE) * ({k1!r} + 1.0))
                     / (CAST(f.tf AS DOUBLE)
                        + {k1!r} * (1.0 - {b!r} + {b!r} * CAST(dl.dl AS DOUBLE)
                                    / (SELECT avgdl FROM avg))) AS c
            FROM qterms q
            JOIN tf f ON f.tokh = q.tokh
            JOIN idf i ON i.tokh = q.tokh
            JOIN dl ON dl.doc_id = f.doc_id
            WHERE f.doc_id <> q.query_id
        ),
        scored AS (
            SELECT query_id, doc_id, round({arms}, 6) AS score
            FROM contrib GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, doc_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rn
            FROM scored
        )
        SELECT query_id, doc_id, score FROM ranked WHERE rn <= {k}
        ORDER BY query_id, score DESC, doc_id
    """


def image_hamming_topk_sql(
    parquet_path: str,
    n_queries: int = 6,
    k: int = 5,
    img_w: int = 32,
    img_h: int = 32,
) -> str:
    """Oracle for ``functions.retrieval.image_hamming_topk``: dHashes
    recomputed FROM THE RAW PPM BYTES in DuckDB (``dhash_select``), queries
    = the ``n_queries`` lexicographically-smallest decodable images, rank =
    exact integer Hamming distance with image-id tie-break — bit-for-bit
    comparable, no float anywhere."""
    dh = dhash_select(parquet_path, img_w=img_w, img_h=img_h)
    return f"""
        WITH dhs AS MATERIALIZED (SELECT * FROM {dh} __d),
        q AS (SELECT image_id AS query_id, dh AS qdh
              FROM dhs ORDER BY image_id LIMIT {n_queries}),
        d AS (
            SELECT q.query_id, i.image_id,
                   CAST(bit_count(xor(q.qdh, i.dh)) AS BIGINT) AS hamming
            FROM q JOIN dhs i ON i.image_id <> q.query_id
        ),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY hamming, image_id) AS rn
            FROM d
        )
        SELECT query_id, image_id, hamming FROM r WHERE rn <= {k}
        ORDER BY query_id, hamming, image_id
    """


def gray_blocks_select(parquet_path: str, img_w: int = 32, img_h: int = 32) -> str:
    """Subquery producing ``(image_id, bi, gval)`` — the engine's image
    tower (``alignment.AlignmentStage._image_vec`` pre-normalisation):
    decode the P6 PPM payload via the hex-chunk trick, 8x8 exact integer
    block sums over all channel bytes on the baked linspace grid, then
    ``gval = blocksum / block_byte_area`` as DOUBLE (exact int operands on
    both sides).  ``bi = by*8 + bx``."""
    import numpy as np

    yi = np.linspace(0, img_h, 9).astype(int)
    xi = np.linspace(0, img_w, 9).astype(int)
    yw, xw = np.diff(yi), np.diff(xi)
    assert (yw > 0).all() and (xw > 0).all(), "image too small for an 8x8 grid"

    def ladder(bounds, var: str) -> str:
        cl = " ".join(
            f"WHEN {var} < {int(bounds[i + 1])} THEN {i}" for i in range(len(bounds) - 2)
        )
        return f"(CASE {cl} ELSE {len(bounds) - 2} END)"

    by_expr = ladder(yi, f"((bidx // 3) // {img_w})")
    bx_expr = ladder(xi, f"((bidx // 3) % {img_w})")
    yw_case = "CASE by " + " ".join(f"WHEN {i} THEN {int(yw[i])}" for i in range(8)) + " END"
    xw_case = "CASE bx " + " ".join(f"WHEN {i} THEN {int(xw[i])}" for i in range(8)) + " END"
    return f"""
        (WITH __gb_src AS MATERIALIZED (
            SELECT image_id, hex("bytes") AS hx,
                   3 + strlen(CAST(w AS VARCHAR)) + 1
                     + strlen(CAST(h AS VARCHAR)) + 1 + 4 AS hdr,
                   w * h * 3 AS nb
            FROM read_parquet('{parquet_path}')
            WHERE fmt = 'ppm' AND "bytes" IS NOT NULL
        ),
        __gb_chunks AS (
            SELECT image_id, nb, j,
                   CAST('0x' || substring(hx, CAST(1 + 2*hdr + 16*j AS BIGINT), 16)
                        AS UBIGINT) AS x
            FROM __gb_src, unnest(range((nb + 7) // 8)) AS u(j)
        ),
        __gb_pix AS (
            SELECT image_id, CAST(8*j + k AS BIGINT) AS bidx,
                   CAST((x >> CAST(8*(7 - k) AS UBIGINT)) & 255 AS BIGINT) AS val, nb
            FROM __gb_chunks, unnest(range(8)) AS kk(k)
            WHERE 8*j + k < nb
        ),
        __gb_blocks AS (
            SELECT image_id, {by_expr} AS by, {bx_expr} AS bx, sum(val) AS s
            FROM __gb_pix GROUP BY 1, 2, 3
        )
        SELECT image_id, by*8 + bx AS bi,
               CAST(s AS DOUBLE) / CAST(({yw_case}) * ({xw_case}) * 3 AS DOUBLE) AS gval
        FROM __gb_blocks)
    """


def _caption_vec_ctes(
    parquet_path: str,
    dim: int,
    embed_seed: int,
    caption_col: str = "caption",
    id_col: str = "image_id",
) -> str:
    """CTE chain (terminated by ``tnorm``) rebuilding the caption tower —
    the feature-hashing embedder at float64 (signed unigram + 2-gram
    counts, L2-normalised; same math as ``embed_ann_topk_sql`` minus the
    float32 storage round-trip, which ``AlignmentStage`` skips)."""
    import numpy as np

    from .hashing import splitmix64 as _sm

    mix = _sm(np.arange(2, dtype=np.uint64) ^ np.uint64(embed_seed))
    toks = tokens_select(f"read_parquet('{parquet_path}')", id_col=id_col, text_col=caption_col)
    th = token_hash_select(toks)
    gram_fold = addmod64(mulmod64("a.tokh", _POLY_P), "b.tokh")
    grams = chain_select(
        f"SELECT a.doc_id, {gram_fold} AS gf FROM {th} a "
        f"JOIN {th} b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1",
        sm64_steps("gf", "gramh", "gr"),
    )
    feats = (
        f"(SELECT doc_id, xor(tokh, CAST({int(mix[0])} AS UBIGINT)) AS fx FROM {th} u "
        f"UNION ALL "
        f"SELECT doc_id, xor(gramh, CAST({int(mix[1])} AS UBIGINT)) AS fx FROM {grams} g)"
    )
    hashed = chain_select(f"SELECT * FROM {feats} f", sm64_steps("fx", "h", "fh"))
    return f"""
        __tc_contrib AS MATERIALIZED (
            SELECT doc_id, CAST(h % {dim} AS INT) AS idx,
                   CASE WHEN (h >> 63) & 1 = 1 THEN -1.0 ELSE 1.0 END AS s
            FROM {hashed} q
        ),
        __tc_vec AS MATERIALIZED (
            SELECT doc_id, idx, CAST(sum(s) AS DOUBLE) AS val
            FROM __tc_contrib GROUP BY doc_id, idx HAVING sum(s) <> 0
        ),
        __tc_nrm AS (SELECT doc_id, sqrt(sum(val * val)) AS n1 FROM __tc_vec GROUP BY doc_id),
        tnorm AS MATERIALIZED (
            SELECT v.doc_id, v.idx, v.val / greatest(n.n1, 1e-12) AS val
            FROM __tc_vec v JOIN __tc_nrm n USING (doc_id)
        )"""


def image_text_alignment_sql(
    parquet_path: str,
    dim: int = 64,
    embed_seed: int = 0x5EED,
    img_w: int = 32,
    img_h: int = 32,
) -> str:
    """Oracle for ``functions.alignment.alignment_scores``: both towers
    rebuilt in DuckDB — the caption feature-hash embedding and the image
    8x8 block-mean vector decoded from the raw PPM bytes — then the
    centered/normalised cosine, rounded to 6 decimals (``+ 0.0``
    normalises a ``-0.0`` round on both sides; the engine mirrors it)."""
    gb = gray_blocks_select(parquet_path, img_w=img_w, img_h=img_h)
    tc = _caption_vec_ctes(parquet_path, dim, embed_seed)
    return f"""
        WITH {tc},
        gvals AS MATERIALIZED (SELECT * FROM {gb} __g),
        cent AS (
            SELECT image_id, bi,
                   gval - sum(gval) OVER (PARTITION BY image_id) / 64 AS cv
            FROM gvals
        ),
        gn AS (
            SELECT image_id, greatest(sqrt(sum(cv * cv)), 1e-12) AS n2
            FROM cent GROUP BY image_id
        ),
        gnorm AS MATERIALIZED (
            SELECT c.image_id, c.bi, c.cv / g.n2 AS c
            FROM cent c JOIN gn g USING (image_id)
        ),
        pairs AS (
            SELECT g.image_id, sum(t.val * g.c) AS s
            FROM gnorm g JOIN tnorm t ON t.doc_id = g.image_id AND t.idx = g.bi
            GROUP BY g.image_id
        )
        SELECT i.image_id, round(coalesce(p.s, 0.0), 6) + 0.0 AS align_score
        FROM (SELECT DISTINCT image_id FROM gvals) i
        LEFT JOIN pairs p USING (image_id)
        ORDER BY image_id
    """


def alignment_filter_sql(
    parquet_path: str,
    q: float = 0.3,
    dim: int = 64,
    embed_seed: int = 0x5EED,
    img_w: int = 32,
    img_h: int = 32,
) -> str:
    """Oracle for ``functions.alignment.alignment_filter``: keep pairs at
    or above the exact corpus ``q``-quantile of the rounded alignment
    scores (``quantile_disc`` == the engine's sparse-histogram cutoff at
    1-based rank ``ceil(q*n)``)."""
    inner = image_text_alignment_sql(
        parquet_path, dim=dim, embed_seed=embed_seed, img_w=img_w, img_h=img_h
    )
    return f"""
        WITH scored AS MATERIALIZED ({inner})
        SELECT image_id FROM scored
        WHERE align_score >= (SELECT quantile_disc(align_score, {q!r}) FROM scored)
        ORDER BY image_id
    """


def image_corpus_assembly_sql(
    parquet_path: str,
    q: float = 0.3,
    max_hamming: int = 6,
    n_shards: int = 8,
    shard_seed: int = 13,
    dim: int = 64,
    embed_seed: int = 0x5EED,
    img_w: int = 32,
    img_h: int = 32,
) -> str:
    """End-to-end oracle for ``pipelines.image_corpus.assemble_image_corpus``:
    alignment scores (both towers from raw bytes) -> quantile_disc gate ->
    semantic Hamming<=k components over the gated dHashes (== the engine's
    band-then-verify by pigeonhole) -> min-node-hash survivors -> splitmix64
    shard placement.  Checks the stage HAND-OFFS, not just each operator."""
    scored = image_text_alignment_sql(
        parquet_path, dim=dim, embed_seed=embed_seed, img_w=img_w, img_h=img_h
    )
    dh = dhash_select(parquet_path, img_w=img_w, img_h=img_h)
    nh = node_hash_select("(SELECT image_id FROM gated)")
    placed = chain_select(
        "SELECT image_id, xor(nh, CAST("
        f"{shard_seed} AS UBIGINT)) AS hx FROM kept_nh",
        sm64_steps("hx", "ph", "pl"),
    )
    return f"""
        WITH RECURSIVE scored AS MATERIALIZED ({scored}),
        gated AS MATERIALIZED (
            SELECT image_id FROM scored
            WHERE align_score >= (SELECT quantile_disc(align_score, {q!r}) FROM scored)
        ),
        dhs0 AS MATERIALIZED (SELECT * FROM {dh} __d),
        dhs AS MATERIALIZED (SELECT d.* FROM dhs0 d JOIN gated USING (image_id)),
        edge AS MATERIALIZED (
            SELECT a.image_id AS u, b.image_id AS v
            FROM dhs a JOIN dhs b ON a.image_id < b.image_id
            WHERE bit_count(xor(a.dh, b.dh)) <= {max_hamming}
        ),
        sym AS MATERIALIZED (SELECT u, v FROM edge UNION SELECT v, u FROM edge),
        nh AS MATERIALIZED (SELECT * FROM {nh} __n),
        reach(u, v) AS (
            SELECT u, v FROM sym
            UNION
            SELECT r.u, e.v FROM reach r JOIN sym e ON r.v = e.u WHERE e.v <> r.u
        ),
        mins AS (
            SELECT r.u AS image_id, min(b.nh) AS mn
            FROM reach r JOIN nh b ON b.image_id = r.v GROUP BY r.u
        ),
        kept_nh AS MATERIALIZED (
            SELECT g.image_id, a.nh FROM gated g
            JOIN nh a USING (image_id)
            LEFT JOIN mins m USING (image_id)
            WHERE m.mn IS NULL OR a.nh < m.mn
        )
        SELECT image_id, CAST(ph % {n_shards} AS BIGINT) AS shard
        FROM {placed} __pl ORDER BY image_id
    """
