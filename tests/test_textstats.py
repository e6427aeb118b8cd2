"""Text-analysis kernel tests."""

import numpy as np

from realestate_scraper_ray.functions.textstats import (
    lang_id, md5_fingerprints, minhash_signatures, quality_stats,
    rolling_hash64, simhash64, token_counts, word_shingle_set, jaccard,
)


def test_token_counts():
    t = token_counts(["a b  c", "", "hello, world! 123"])
    assert t["n_tokens_ws"].to_pylist() == [3, 0, 3]
    # bpe-ish: hello , world ! 123 → 5
    assert t["n_tokens_bpe"].to_pylist()[2] == 5


def test_quality_stats():
    q = quality_stats(["ab, cd! 12"])
    assert q["n_punct"].to_pylist() == [2]
    assert q["n_digits"].to_pylist() == [2]
    assert q["n_words"].to_pylist() == [3]


def test_lang_id_heuristic():
    texts = [
        "the cat and the dog are in the house with all of them",
        "der Hund und die Katze sind in dem Haus mit einer Maus",
        "le chat et le chien sont dans la maison avec les enfants",
        "el gato y el perro en la casa con los amigos para todos",
        "kot i pies są w domu ale nie ma ich tak jak przed chwilą",
        "xyzzy plugh 42",
    ]
    assert lang_id(texts).to_pylist() == ["en", "de", "fr", "es", "pl", "und"]


def test_fingerprints_deterministic():
    texts = ["alpha beta", "alpha beta", "gamma"]
    fps = md5_fingerprints(texts).to_pylist()
    assert fps[0] == fps[1] != fps[2]
    rh = rolling_hash64(texts).to_pylist()
    assert rh[0] == rh[1] != rh[2]
    assert rolling_hash64(texts).to_pylist() == rh  # stable across calls


def test_minhash_estimates_jaccard():
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    b = a.replace("w8", "x8")       # high overlap
    c = " ".join(f"z{i}" for i in range(16))  # disjoint
    sig = minhash_signatures([a, b, c], num_perm=128)
    est_ab = (sig[0] == sig[1]).mean()
    est_ac = (sig[0] == sig[2]).mean()
    true_ab = jaccard(word_shingle_set(a), word_shingle_set(b))
    assert abs(est_ab - true_ab) < 0.15
    assert est_ac == 0.0


def test_simhash_close_for_similar():
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    b = a.replace("w8", "x8")
    c = " ".join(f"z{i}" for i in range(16))
    h = simhash64([a, b, c])
    ham_ab = bin(int(h[0]) ^ int(h[1])).count("1")
    ham_ac = bin(int(h[0]) ^ int(h[2])).count("1")
    assert ham_ab < ham_ac
    assert ham_ab <= 16


def test_empty_text_edge_cases():
    assert token_counts([""])["n_tokens_ws"].to_pylist() == [0]
    assert simhash64([""])[0] == 0
    assert (minhash_signatures([""]) == np.iinfo(np.uint64).max).all()


def test_fnv1a64_golden_values_and_cap_ordering(ray_session):
    """fnv1a64 exists to be VERSION-STABLE (url-seen keys persist in
    crawl checkpoints), so pin it to the published FNV-1a constants —
    any library or implementation drift must fail loudly here."""
    import numpy as np
    import pyarrow as pa

    from realestate_scraper_ray.functions.textstats import fnv1a64
    got = fnv1a64(pa.array(["", "a", "abc", "żółć",
                            "https://www.otodom.pl/pl/oferta/m-1-ID1"],
                           pa.string()))
    # offset basis; FNV-1a("a"); FNV-1a("abc") — published test vectors
    assert got[0] == 0xcbf29ce484222325
    assert got[1] == 0xaf63dc4c8601ec8c
    assert got[2] == 0xe71fa2190541574b

    def ref(s: str) -> int:
        h = 0xcbf29ce484222325
        for b in s.encode():
            h = ((h ^ b) * 0x100000001b3) % (1 << 64)
        return h

    assert [int(x) for x in got] == [
        ref(s) for s in ["", "a", "abc", "żółć",
                         "https://www.otodom.pl/pl/oferta/m-1-ID1"]]


def test_grouped_percentile_cap_fires_before_pull(ray_session):
    """The driver sketch cap must raise rather than absorb the
    sketches; with a cap smaller than one sketch it fires for any
    grouped input."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from realestate_scraper_ray.functions.sketches import grouped_percentile_disc
    ds = rd.from_arrow(pa.table({"g": ["a", "b"] * 50,
                                 "v": [float(i) for i in range(100)]}))
    with pytest.raises(ValueError, match="sketch cap"):
        grouped_percentile_disc(ds, "g", "v", {"p50": 0.5}, nbins=1024,
                                driver_cap_bytes=100)


def test_gopher_rules_reference_cases():
    """Each Gopher rule (Rae et al. 2021, Table A1) trips on a crafted
    document while a plain passing document survives; counters match
    hand computation."""
    from realestate_scraper_ray.functions.textstats import (
        gopher_pass, gopher_stats,
    )
    passing = ("the cheerful cat sat on of that mat and we have fun "
               "with it " * 10)
    cases = {
        "too_few_words": "the of words here",                 # < 50 words
        "short_words": "a b c " * 40 + "the of",              # mean < 3
        "symbols": "#tag " * 30 + passing,                    # #/word > .1
        "bullets": "\n".join("- item the of and that" for _ in range(20)),
        "ellipsis": "\n".join(f"cut off the of and that{i}..."
                              for i in range(10)),
        "non_alpha": "12 34 56 78 " * 30 + "the of",          # alpha < 80%
        "no_stopwords": "zebra quokka lemur pangolin " * 20,  # < 2 stops
    }
    st = gopher_stats([passing, *cases.values()])
    keep = gopher_pass(st).to_pylist()
    assert keep[0] is True
    assert keep[1:] == [False] * len(cases)
    row0 = {n: st[n][0].as_py() for n in st.column_names}
    assert row0["n_words"] == 140 and row0["n_lines"] == 1
    assert row0["n_stop_hits"] == 6  # the of that and have with
    bullets = {n: st[n][4].as_py() for n in st.column_names}
    assert bullets["n_bullet_lines"] == bullets["n_lines"] == 20
    ell = {n: st[n][5].as_py() for n in st.column_names}
    assert ell["n_ellipsis_lines"] == ell["n_lines"] == 10
