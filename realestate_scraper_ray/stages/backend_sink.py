"""Wire-protocol backend sink (S13/S14/S15, core/backend.py:10-234).

The reference streams each parsed offer into a REST backend and a
message queue: ``POST /apartments/duplicates/check`` (spatial+price+
footage window, radius 50 m), skip when a match exists, else
``POST /apartments`` (the exact 1:1 payload mapping, zero-price blocked
a second time at the sink), one ``POST /photos`` per photo LINK, then a
persistent ``{"apartment_id": N}`` publish to the durable
``scraper_new_offers`` queue (backend.py:189-234).

Ray-Data shape: photo URLs are folded to one list per offer (combiner
inside ``map_batches``, then a small groupby — never a per-offer
shuffle), hash-joined onto the offers, and the upload itself is an
ACTOR-POOL stage: ``BackendUploader.__init__`` builds the HTTP session
and the AMQP publisher once per actor (ST3), ``__call__`` walks its
batch making the per-offer wire calls (network-bound by nature — this
is the one stage where a row loop IS the semantics). Results stream out
as a table (offer_id, duplicate, apartment_id, photos_sent, notified),
so a driver can audit / resume without re-reading the backend.

At 100 TB scale the stage is bounded by the backend's own write
throughput, not the engine: concurrency × batch_size only controls how
many offers are in flight; all state is per-actor."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import ray.data as rd

from .amqp import AmqpPublisher
from .http import HttpSession

NOTIFY_QUEUE = "scraper_new_offers"  # backend.py:196


@dataclass
class BackendClient:
    """The REST adapter, payloads reference-exact (backend.py:10-187).
    One per uploader actor; single-attempt POSTs (a create is not
    idempotent) over a persistent session."""

    api_url: str
    session: HttpSession | None = None
    n_calls: int = field(default=0, init=False)

    def __post_init__(self):
        self.api_url = self.api_url.rstrip("/")
        if self.session is None:
            self.session = HttpSession(
                user_agent="realestate-scraper-ray/1.0", attempts=1)

    def _post(self, path: str, payload: dict,
              timeout_s: float = 5.0) -> "Any":
        self.n_calls += 1
        return self.session.post_json(self.api_url + path, payload,
                                      timeout_s=timeout_s)

    @staticmethod
    def _dup_payload(data: dict) -> dict | None:
        """backend.py:20-39: all four of lat/lon/price/footage must be
        present (and truthy) or the check is skipped."""
        lat, lon = data.get("lat"), data.get("lon")
        price, footage = data.get("price_amount"), data.get("area_m2")
        if not all([lat, lon, price, footage]):
            return None
        return {
            "center": {"lat": lat, "lng": lon},
            "radius_m": 50,
            "price_min": price - 100,
            "price_max": price + 100,
            "footage_min": footage - 1.0,
            "footage_max": footage + 1.0,
            "limit": 1,
        }

    def find_apartment_id(self, data: dict) -> int | None:
        """backend.py:14-56: first match's id, tolerant of both the
        ``{"matches": […]}`` and bare-list response shapes."""
        payload = self._dup_payload(data)
        if payload is None:
            return None
        try:
            resp = self._post("/apartments/duplicates/check", payload)
            if resp.status == 200:
                import json
                results = json.loads(resp.text())
                if isinstance(results, dict):
                    matches = results.get("matches", [])
                    if matches:
                        return int(matches[0]["id"])
                elif isinstance(results, list) and results:
                    return int(results[0]["id"])
        except Exception:
            pass
        return None

    def check_duplicate(self, data: dict) -> bool:
        """backend.py:58-93: boolean twin of the window check
        (``has_matches`` dict shape or non-empty list)."""
        payload = self._dup_payload(data)
        if payload is None:
            return False
        try:
            resp = self._post("/apartments/duplicates/check", payload,
                              timeout_s=2.0)
            if resp.status == 200:
                import json
                results = json.loads(resp.text())
                if isinstance(results, dict):
                    return bool(results.get("has_matches", False))
                if isinstance(results, list):
                    return len(results) > 0
        except Exception:
            pass
        return False

    def create_apartment(self, data: dict) -> int | bool:
        """backend.py:95-156 — the exact payload mapping, including the
        second zero-price block, the six attractiveness defaults, and
        the description[:5000] truncation. Returns the backend-assigned
        id on 200/201, False otherwise."""
        price = data.get("price_amount")
        if not price or price <= 0:
            return False
        payload = {
            "source_website": data.get("source", "unknown"),
            "source_id": str(data.get("offer_id", "")),
            "source_url": data.get("url", "") or data.get("offer_url", ""),
            "price": price,
            "currency": data.get("price_currency", "PLN"),
            "room_num": data.get("rooms", 1),
            "footage": data.get("area_m2"),
            "price_per_m2": data.get("price_per_m2"),
            "city": data.get("city", "Nieznane"),
            "geolocation": {"lat": data.get("lat"), "lng": data.get("lon")},
            "description": (data.get("description") or "")[:5000],
            # backend-required defaults the scraper has no values for
            "photo_attractiveness": 0,
            "student_attractiveness": 0,
            "family_attractiveness": 0,
            "single_attractiveness": 0,
            "dog_owner_attractiveness": 0,
            "universal_attractiveness": 0,
            "poi_desc": None,
            "price_desc": None,
            "size_desc": None,
        }
        try:
            resp = self._post("/apartments", payload)
            if resp.status in (200, 201):
                import json
                return int(json.loads(resp.text()).get("id"))
            return False
        except Exception:
            return False

    def upload_photo(self, apartment_id: int, photo_url: str) -> bool:
        """backend.py:158-187: the backend stores LINKS, not bytes."""
        try:
            resp = self._post("/photos", {
                "apartment_id": apartment_id,
                "link": photo_url,
                "style": "other",
            })
            return resp.status in (200, 201)
        except Exception:
            return False


class BackendUploader:
    """Actor-pool sink stage: one REST client + one AMQP publisher per
    actor, per-offer wire calls per batch. Expects rows carrying the
    wide-offer columns plus a ``photo_urls`` list column (see
    ``upload_offers``)."""

    def __init__(self, api_url: str, notify: dict | None = None):
        self.client = BackendClient(api_url)
        self.publisher = AmqpPublisher(**notify) if notify else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = {"offer_id": [], "duplicate": [], "apartment_id": [],
               "photos_sent": [], "notified": []}
        for row in rows:
            dup = self.client.check_duplicate(row)
            apt_id: int | bool = False
            sent = 0
            notified = False
            if not dup:
                apt_id = self.client.create_apartment(row)
                if apt_id:
                    import json as _json
                    pj = row.get("photo_urls_json")
                    urls = (_json.loads(pj) if pj
                            else row.get("photo_urls") or [])
                    for url in urls:
                        sent += self.client.upload_photo(apt_id, url)
                    if self.publisher is not None:
                        notified = self.publisher.publish(
                            NOTIFY_QUEUE, {"apartment_id": apt_id})
            out["offer_id"].append(row.get("offer_id"))
            out["duplicate"].append(dup)
            out["apartment_id"].append(int(apt_id) if apt_id else -1)
            out["photos_sent"].append(sent)
            out["notified"].append(notified)
        return pa.table({
            "offer_id": pa.array(out["offer_id"], pa.string()),
            "duplicate": pa.array(out["duplicate"], pa.bool_()),
            "apartment_id": pa.array(out["apartment_id"], pa.int64()),
            "photos_sent": pa.array(out["photos_sent"], pa.int64()),
            "notified": pa.array(out["notified"], pa.bool_()),
        })


def fold_photo_lists(photos: rd.Dataset) -> rd.Dataset:
    """(offer_id, seq, url) → (offer_id, photo_urls_json), seq-ordered.
    Combiner-first: each batch folds to one list row per offer it holds,
    then one small groupby merges the (rare) offers split across
    batches — the exchange moves one row per (offer, batch), never one
    per photo."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        g = (df.sort("seq")
               .group_by("offer_id", maintain_order=True)
               .agg(pl.struct("seq", "url").alias("pairs")))
        out = g.to_arrow()
        # polars emits large_string; the join side is plain string
        return out.cast(pa.schema([
            ("offer_id", pa.string()),
            ("pairs", pa.list_(pa.struct([("seq", out.schema.field("pairs")
                                           .type.value_type.field("seq").type),
                                          ("url", pa.string())])))]))

    def merge(t: pa.Table) -> pa.Table:
        # emit the list JSON-encoded: Arrow's hash join cannot carry
        # list<> payload columns, and the uploader decodes per row
        # anyway (it is already on the Python side of the wire calls)
        df = pl.from_arrow(t)
        g = (df.explode("pairs")
               .unnest("pairs")
               .sort(["offer_id", "seq"])
               .group_by("offer_id", maintain_order=True)
               .agg(pl.col("url").alias("photo_urls")))
        import json as _json
        return pa.table({
            "offer_id": pa.array(g["offer_id"].to_list(), pa.string()),
            "photo_urls_json": pa.array(
                [_json.dumps(v) for v in g["photo_urls"].to_list()],
                pa.string())})

    return (photos.map_batches(partial, batch_format="pyarrow")
            .groupby("offer_id")
            .map_groups(merge, batch_format="pyarrow"))


def upload_offers(offers: rd.Dataset, photos: rd.Dataset | None,
                  api_url: str, *, notify: dict | None = None,
                  concurrency: int = 4, batch_size: int = 64) -> rd.Dataset:
    """The full S13–S15 sink: fold photo links per offer, attach them to
    the offer rows (left join — offers without photos still upload),
    stream through the uploader pool. Returns the audit table."""
    if photos is not None and photos.count() > 0:
        from .joins import adaptive_partitions
        folded = fold_photo_lists(photos)
        offers = offers.join(
            folded, join_type="left_outer", on=("offer_id",),
            num_partitions=adaptive_partitions(offers.count()))
    return offers.map_batches(
        BackendUploader, fn_constructor_kwargs={
            "api_url": api_url, "notify": notify},
        concurrency=concurrency, batch_size=batch_size,
        num_cpus=0.25,  # network-bound: don't starve compute stages
        batch_format="pyarrow")
