"""City-name canonicalization (J6).

Reference: ``database_corrections/cities_rename.py:63-109, 153-167`` —
a broadcast dict join from ``city_key(city)`` (normalized key) to the
official TERYT name, with **ambiguous keys dropped** (a key that maps
to more than one official name canonicalizes nothing). The side table
here is synthesized (a TERYT-like list of official names with
diacritics); the operator is the broadcast hash join shape: the small
side is ``ray.put`` once and each batch does a dict lookup — never a
shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from .urls import slugify

# Synthetic TERYT-like official-name table: (key, canonical). The two
# 'ambig' rows share a key on purpose — build_canonical_map drops it.
CANONICAL_CITIES: tuple[tuple[str, str], ...] = (
    ("gdansk", "Gdańsk"), ("warszawa", "Warszawa"), ("krakow", "Kraków"),
    ("lodz", "Łódź"), ("wroclaw", "Wrocław"), ("poznan", "Poznań"),
    ("szczecin", "Szczecin"), ("katowice", "Katowice"),
    ("ambig", "Ambigtown-A"), ("ambig", "Ambigtown-B"),
)


def city_key(name: str) -> str:
    """Normalization key: NFKD de-accent + lowercase + dash-join
    (cities_rename.py:33-60 _norm semantics via the shared slugify)."""
    return slugify(name)


def build_canonical_map(entries=CANONICAL_CITIES) -> dict[str, str]:
    """key → official name; keys with >1 distinct official name are
    dropped entirely (cities_rename.py ambiguous-key rule)."""
    seen: dict[str, set[str]] = {}
    for key, name in entries:
        seen.setdefault(key, set()).add(name)
    return {k: next(iter(v)) for k, v in seen.items() if len(v) == 1}


def city_in_text(texts, city: str) -> "pa.Array":
    """M29 (gratka.py:89-93 _city_in_text): normalized-containment
    filter — True when the normalized city key appears in the
    normalized text (listing-card location strings). Vectorized:
    normalize the city once, slug-normalize the text column with polars
    and substring-match."""
    import polars as pl
    key = city_key(city)
    s = pl.from_arrow(texts if isinstance(texts, (pa.Array, pa.ChunkedArray))
                      else pa.array(texts, pa.string()))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    # the polars normalization mirrors slugify for the containment
    # check: lowercase, de-accent the Polish set, non-alnum → dash
    norm = (s.str.to_lowercase()
            .str.replace_all("ą", "a").str.replace_all("ć", "c")
            .str.replace_all("ę", "e").str.replace_all("ł", "l")
            .str.replace_all("ń", "n").str.replace_all("ó", "o")
            .str.replace_all("ś", "s").str.replace_all("ż", "z")
            .str.replace_all("ź", "z")
            .str.replace_all(r"[^a-z0-9]+", "-", literal=False))
    return norm.str.contains(key, literal=True).to_arrow().cast(pa.bool_())


def canonicalize_cities(ds: rd.Dataset, col: str,
                        entries=CANONICAL_CITIES,
                        keep_col: str = "city_canon") -> rd.Dataset:
    """Broadcast join: rows whose key matches an unambiguous official
    name gain ``keep_col``; unmatched / ambiguous rows are dropped
    (delete_wrong_offers.py:32-76 drop semantics)."""
    mapping = build_canonical_map(entries)
    ref = ray.put(mapping)

    def join(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = ray.get(ref)
        # distinct-then-scatter: slugify once per DISTINCT city (city
        # cardinality, not row count), then one vectorized take
        vals = t[col].combine_chunks()
        uniq = pc.unique(vals)
        lut = pa.array([m.get(city_key(c)) if c is not None else None
                        for c in uniq.to_pylist()], pa.string())
        canon = lut.take(pc.index_in(vals, value_set=uniq))
        out = t.append_column(keep_col, canon)
        return out.filter(pc.is_valid(out[keep_col]))

    return ds.map_batches(join, batch_format="pyarrow")
