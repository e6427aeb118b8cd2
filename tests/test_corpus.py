"""Corpus-curation operators (dedup clustering, vocabulary,
repetition quality, decontamination, PII scrub) vs the DuckDB oracles
at sf0.001, plus connected-components unit tests against a
brute-force union-find."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(sql).df()


def _check(name: str):
    from realestate_scraper_ray.pipelines.relational import ORACLE, QUERIES

    got = QUERIES[name](SF)
    exp = _oracle(ORACLE[name])
    assert sorted(got.columns) == sorted(exp.columns)
    a = got[sorted(got.columns)].reset_index(drop=True)
    b = exp[sorted(exp.columns)].reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy(),
                              equal_nan=(a[c].dtype.kind == "f")), c


def test_dedup_components_matches_oracle():
    _check("dedup_components")


def test_corpus_top_terms_matches_oracle():
    _check("corpus_top_terms")


def test_doc_repetition_stats_matches_oracle():
    _check("doc_repetition_stats")


def test_decontaminate_matches_oracle():
    _check("decontaminate")


def test_pii_scrub_matches_oracle():
    _check("pii_scrub")


def test_dedup_corpus_survivors_matches_oracle():
    _check("dedup_corpus_survivors")


# ---------------------------------------------------------------------------
# connected_components vs brute-force union-find
# ---------------------------------------------------------------------------


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    label = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            label[v] = m
    return [label[v] for v in range(n_nodes)]


def _run_cc(n_nodes, edges):
    import ray.data as rd

    from realestate_scraper_ray.stages.graph import connected_components

    nodes = rd.from_arrow(pa.table({"id": pa.array(range(n_nodes), pa.int64())}))
    e = rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))
    out = connected_components(nodes, e, "id", num_partitions=4).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert list(out["id"]) == list(range(n_nodes))
    # both strategies must agree: the adaptive small-graph union-find
    # (default cap) and the distributed rounds (cap forced to 0)
    dist = connected_components(nodes, e, "id", num_partitions=4,
                                small_graph_bytes=0).to_pandas()
    dist = dist.sort_values("id").reset_index(drop=True)
    assert list(dist["component"].astype(int)) == \
        list(out["component"].astype(int))
    return list(out["component"].astype(int))


def test_cc_empty_edges():
    assert _run_cc(5, []) == [0, 1, 2, 3, 4]


def test_cc_chain():
    # a chain exercises multi-round propagation + the pointer jump
    n = 16
    edges = [(i, i + 1) for i in range(n - 1)]
    assert _run_cc(n, edges) == [0] * n


def test_cc_random_graph():
    rng = np.random.default_rng(7)
    n = 60
    edges = [tuple(sorted(map(int, rng.integers(0, n, 2)))) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_cc(n, edges) == _uf_components(n, edges)


def test_unigram_topv_model_oov_floor(ray_session):
    """The LM scale path: a top-V model scores in-vocab tokens exactly
    like the full model and gives every OOV token the 1/total floor."""
    import math

    import pandas as pd

    from realestate_scraper_ray.functions.corpus import (
        build_unigram_model, logprob_scores, unigram_partials)
    ids = [1, 2]
    texts = ["aa aa aa bb", "aa bb cc"]  # counts: aa=4 bb=2 cc=1, total 7
    counts = unigram_partials(ids, texts).to_pandas()
    counts = counts.groupby("tok", as_index=False)["c"].sum()
    full, _ = build_unigram_model(counts)
    top, oov = build_unigram_model(counts, top_v=2)  # keeps aa, bb
    assert sorted(top["tok"].to_pylist()) == ["aa", "bb"]
    assert oov == int(round(math.log(1 / 7) * 1e6))
    f = logprob_scores(ids, texts, full).to_pandas().set_index("doc_id")
    t = logprob_scores(ids, texts, top, oov_lp=oov
                       ).to_pandas().set_index("doc_id")
    # doc 1 has no OOV tokens: identical under both models
    assert t.loc[1, "lp_micro_sum"] == f.loc[1, "lp_micro_sum"]
    assert t.loc[1, "tok_n"] == f.loc[1, "tok_n"] == 4
    # doc 2: 'cc' is OOV in the top-2 model → floored, still counted
    lp = {tok: int(round(math.log(c / 7) * 1e6))
          for tok, c in zip(counts["tok"], counts["c"])}
    assert t.loc[2, "tok_n"] == 3
    assert t.loc[2, "lp_micro_sum"] == lp["aa"] + lp["bb"] + oov


def test_corpus_cluster_map_planted_clusters(ray_session, tmp_path):
    """Two well-separated embedding blobs whose docs carry distinct
    dominant tokens: the map must recover the blob sizes and surface
    each blob's token, and must equal a sequential oracle exactly."""
    import pandas as pd
    import pyarrow.parquet as pq

    from realestate_scraper_ray.pipelines.relational import (
        corpus_cluster_map, corpus_cluster_map_gate)

    rng = np.random.default_rng(21)
    d = 8
    a, b = np.zeros(d), np.zeros(d)
    a[0], b[1] = 10.0, 10.0
    vecs, texts, ids = [], [], []
    for i in range(30):
        blob = a if i < 18 else b
        vecs.append((blob + 0.1 * rng.standard_normal(d)).astype(np.float32))
        tok = "alpha" if i < 18 else "beta"
        texts.append(f"{tok} {tok} filler{i % 3} {tok}")
        ids.append(i)
    pq.write_table(pa.table({"doc_id": ids, "text": texts,
                             "lang": ["pl"] * 30}),
                   str(tmp_path / "documents.parquet"))
    pq.write_table(pa.table({"vec_id": ids,
                             "embedding": [v.tolist() for v in vecs],
                             "label": [0] * 30}),
                   str(tmp_path / "embeddings.parquet"))
    out = corpus_cluster_map(str(tmp_path))
    gate = corpus_cluster_map_gate(str(tmp_path))
    assert int(gate["n_docs_total"].iloc[0]) == 30
    assert bool(gate["partition_ok"].iloc[0])
    assert int(out["n_docs"].sum()) == 30
    # k=8 > 2 blobs, so blobs may fragment — but never mix: every
    # cluster's dominant term is exactly one blob's token, and both
    # blobs surface somewhere
    firsts = {t.split(",")[0] for t in out["top_terms"] if t}
    assert firsts == {"alpha", "beta"}
    # sequential oracle: same centroids, pandas tf + same top-5 rule
    from realestate_scraper_ray.stages.similarity import ivf_centroids
    import ray.data as rd
    embs = rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": [v.tolist() for v in vecs]}))
    cents = ivf_centroids(embs, "embedding", "vec_id", 8, 2)
    m = np.array(vecs, dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(m @ cents.T, axis=1)
    rows = []
    for c in np.unique(assign):
        sel = [i for i in ids if assign[i] == c]
        toks = pd.Series([w for i in sel for w in texts[i].split(" ")])
        tf = (toks.value_counts().rename_axis("token").reset_index(name="c")
              .sort_values(["c", "token"], ascending=[False, True]).head(5))
        rows.append({"cluster": int(c), "n_docs": len(sel),
                     "top_terms": ",".join(tf["token"])})
    exp = pd.DataFrame(rows).sort_values("cluster").reset_index(drop=True)
    got = out.astype({"cluster": "int64", "n_docs": "int64"})
    assert got.to_dict("records") == exp.to_dict("records")


def test_domain_cap_sample_binds_and_orders(ray_session):
    """The per-source quota on a skewed synthetic corpus: one hot
    source far over the cap, one under, exact rank/tie semantics vs a
    brute-force reference. Runs the registered query body over a temp
    parquet dir shaped like the testdata."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow.parquet as pq
    from realestate_scraper_ray.pipelines.relational import QUERIES

    rng = np.random.default_rng(11)
    n_hot, n_cold = 300, 5
    df = pd.DataFrame({
        "doc_id": np.arange(n_hot + n_cold, dtype=np.int64),
        "text": ["x"] * (n_hot + n_cold),
        "lang": ["pl"] * (n_hot + n_cold),
        "source": ["hot"] * n_hot + ["cold"] * n_cold,
        # heavy ties: only 7 distinct lengths in the hot source
        "n_chars": np.concatenate([rng.integers(10, 17, n_hot),
                                   rng.integers(100, 200, n_cold)]).astype("int64"),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        got = pa.Table.from_pylist(
            QUERIES["domain_cap_sample"](d).take_all()).to_pandas()
    exp = (df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
           .groupby("source", sort=False).head(20)
           .sort_values(["source", "n_chars", "doc_id"],
                        ascending=[True, False, True]))
    exp = exp.assign(rnk=exp.groupby("source").cumcount() + 1)
    got = got.sort_values(["source", "rnk"]).reset_index(drop=True)
    exp = exp[["source", "doc_id", "n_chars", "rnk"]].reset_index(drop=True)
    assert got.astype(str).to_dict("records") == exp.astype(str).to_dict("records")
    assert got.groupby("source").size().to_dict() == {"hot": 20, "cold": 5}


def test_dsir_weights_match_brute_force_and_rank_target_up():
    """DSIR kernels vs a from-scratch reimplementation on a toy corpus;
    docs drawn from the target vocabulary must outrank the rest."""
    import math

    import numpy as np
    import pandas as pd

    from realestate_scraper_ray.functions.corpus import (
        build_dsir_model, dsir_partials, dsir_scores,
    )
    docs = {
        1: ("aa bb aa cc", True),   # target-domain docs
        2: ("aa aa bb", True),
        3: ("xx yy zz xx", False),  # off-domain
        4: ("aa xx", False),        # mixed
    }
    ids = np.array(list(docs), dtype=np.int64)
    texts = [docs[i][0] for i in ids]
    flags = np.array([docs[i][1] for i in ids])
    counts = (dsir_partials(ids, texts, flags).to_pandas()
              .groupby("tok", as_index=False).sum())
    model = dsir_scores(ids, texts, build_dsir_model(counts)).to_pandas()

    # brute force
    toks = [(i, w, docs[i][1]) for i in ids for w in docs[i][0].split(" ")]
    raw = pd.Series([w for _, w, _ in toks]).value_counts()
    tgt = pd.Series([w for _, w, f in toks if f]).value_counts()
    sr, st, v = float(raw.sum()), float(sum(tgt)), float(len(raw))
    dlp = {w: int(round((math.log((tgt.get(w, 0) + 1) / (st + v))
                         - math.log((raw[w] + 1) / (sr + v))) * 1e6))
           for w in raw.index}
    for i in ids:
        expect = sum(dlp[w] for w in docs[i][0].split(" "))
        got = int(model.loc[model.doc_id == i, "dsir_micro_sum"].iloc[0])
        assert got == expect, (i, got, expect)
    s = model.set_index("doc_id")["dsir_micro_sum"]
    assert min(s[1], s[2]) > s[4] > s[3]  # target > mixed > off-domain


def test_top_terms_per_source_bruteforce_and_split_invariant(
        ray_session, tmp_path):
    """Per-source top-k: brute-force equality on synthetic data with a
    term whose count is SPLIT across blocks (a pre-sum local top-k
    would drop it) + cross-block ties broken lexicographically."""
    import collections

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = []
    # 'rare-but-global' appears ONCE per doc across many docs of source
    # a, each doc alongside 8 per-doc-repeated decoy terms — inside any
    # single 5-row block the decoys crowd it out of a local top-5, so a
    # (broken) pre-sum local top-k would drop it even though its summed
    # count (40) belongs in the global top-5
    for i in range(40):
        # 7 reps: inside a 5-row block each decoy counts 7 while
        # rare-but-global counts 5 (one per doc) — a pre-sum local
        # top-5 keeps common(10) + 4 decoys(7) and DROPS it
        decoys = " ".join(f"decoy-{i}-{j} " * 7 for j in range(8))
        docs.append(("a", f"rare-but-global common common {decoys}"))
    docs.append(("a", " ".join(["burst"] * 35)))
    for i in range(10):
        docs.append(("b", f"tie-{i % 2} zz"))
    t = pa.table({"doc_id": np.arange(len(docs), dtype=np.int64),
                  "source": [s for s, _ in docs],
                  "text": [x for _, x in docs]})
    pq.write_table(t, tmp_path / "documents.parquet", row_group_size=5)

    from realestate_scraper_ray.pipelines.relational import QUERIES
    got = QUERIES["corpus_top_terms_per_source"](str(tmp_path))

    want = collections.defaultdict(collections.Counter)
    for s, x in docs:
        want[s].update(w for w in x.split(" ") if w)
    for s, grp in got.groupby("source"):
        exp = sorted(want[s].items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert list(zip(grp["term"], grp["n"])) == exp
    a = got[got["source"] == "a"]
    assert "rare-but-global" in set(a["term"])  # survives block-split
    assert int(a[a["term"] == "rare-but-global"]["n"].iloc[0]) == 40


def test_inverted_index_matches_bruteforce(ray_session, tmp_path):
    import re
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from realestate_scraper_ray.pipelines.relational import (
        QUERIES, _INVIDX_MIN_DF)

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(8)]
    texts = []
    n = 300
    for i in range(n):
        k = rng.integers(1, 6)
        words = list(rng.choice(vocab[:4], k))     # frequent head
        if i % 7 == 0:
            words += ["rare"]                      # df = ~43 < threshold
        words += [words[0]]                        # in-doc repeat: tf > df
        texts.append("  ".join(words))             # multi-space split
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
    }), tmp_path / "documents.parquet", row_group_size=64)

    got = QUERIES["corpus_inverted_index"](str(tmp_path))
    exp = {}
    for d, txt in enumerate(texts):
        toks = [t for t in re.split(r"\s+", txt) if t]
        for t in toks:
            df_, tf_, first = exp.get(t, (set(), 0, d))
            df_.add(d)
            exp[t] = (df_, tf_ + 1, min(first, d))
    exp = {t: (len(df_), tf_, first) for t, (df_, tf_, first) in exp.items()
           if len(df_) >= _INVIDX_MIN_DF}
    got_map = {r.token: (r.df, r.tf, r.first_doc) for r in got.itertuples()}
    assert got_map == exp
    assert "rare" not in got_map          # under the df gate
    assert any(tf_ > df_ for df_, tf_, _ in got_map.values())
