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
