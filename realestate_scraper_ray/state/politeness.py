"""Per-host politeness: token-bucket shard actors + robots.txt cache.

The reference's limiter is process-global and host-oblivious
(/root/reference/scrapper/core/http.py:11-21, min_interval = 1/rps,
default 0.3 rps — config.py:10). Here the budget is **per host** (the
north_rule politeness model): hosts hash onto a small pool of async
token-bucket actors; a fetch task asks ``acquire(host, n)`` before
issuing n requests to that host and sleeps for the returned delay.
Adding workers therefore never raises per-host pressure — extra
parallelism only helps across hosts, which is exactly the property that
makes throughput scale with the host count (SURVEY.md §7.5).

Robots handling (north_rule addition; the reference has none): a
per-fetcher-actor cache of parsed Disallow prefixes, one fetch of
robots.txt per host per actor.
"""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0.25)
class PolitenessShard:
    """Token buckets for the hosts hashed onto this shard.

    Logical-clock buckets: ``free_at[host]`` is the monotonic time the
    host's next request slot opens. ``acquire(host, n)`` books n slots
    at ``1/rps`` spacing and returns how long the caller must sleep
    until the FIRST booked slot opens; the caller then paces its n
    requests one ``1/rps`` interval apart (the fetch stage does this
    per host inside the batch loop), so every request lands on or after
    its booked slot — full budget compliance with zero dead time at
    batch boundaries. The actor itself never sleeps, so one shard
    serves many hosts without blocking.
    """

    def __init__(self, rps_per_host: float, burst: int = 1,
                 backoff_factor: float = 1.0,
                 backoff_cap_mult: float = 16.0):
        self.interval = 1.0 / rps_per_host
        self.burst = max(1, burst)
        self.free_at: dict[str, float] = {}
        # adaptive failure backoff (AIMD-style, multiplicative both
        # ways): a host's effective spacing is interval × mult[host];
        # report() multiplies by backoff_factor per failed request
        # (capped) and divides per success (floored at 1.0). factor 1.0
        # = backoff off (the default; the reference retries per URL but
        # never slows a failing host down).
        self.bf = max(1.0, backoff_factor)
        self.cap = max(1.0, backoff_cap_mult)
        self.mult: dict[str, float] = {}
        # per-host base-spacing floor (robots.txt Crawl-delay): a server
        # may ask for WIDER spacing than the configured budget; never
        # narrower — the configured interval stays the global floor
        self.min_int: dict[str, float] = {}

    def set_min_spacing(self, host: str, interval: float) -> float:
        """Raise (never lower) a host's base spacing to the server's
        published Crawl-delay. Idempotent; returns the effective base."""
        if interval > self.interval:
            cur = self.min_int.get(host, 0.0)
            if interval > cur:
                self.min_int[host] = interval
        return max(self.interval, self.min_int.get(host, 0.0))

    def _spacing(self, host: str) -> float:
        base = self.min_int.get(host)
        if base is None or base < self.interval:
            base = self.interval
        return base * self.mult.get(host, 1.0)

    def book(self, host: str, n: int) -> tuple[float, float]:
        """Book n slots; returns (delay until first slot, per-request
        spacing the caller must pace at)."""
        now = time.monotonic()
        spacing = self._spacing(host)
        free = self.free_at.get(host, now)
        free = max(free, now - self.burst * spacing)  # cap accrued burst
        self.free_at[host] = free + n * spacing
        return max(0.0, free - now), spacing

    def acquire(self, host: str, n: int) -> float:
        return self.book(host, n)[0]

    def report(self, host: str, n_fail: int, n_ok: int) -> float:
        """Fold a batch's per-host outcome into the backoff multiplier;
        returns the new multiplier (for tests/metrics)."""
        if self.bf <= 1.0:
            return 1.0
        m = self.mult.get(host, 1.0)
        if n_fail:
            m = min(self.cap, m * self.bf ** n_fail)
        if n_ok:
            m = max(1.0, m / self.bf ** n_ok)
        if m == 1.0:
            self.mult.pop(host, None)
        else:
            self.mult[host] = m
        return m

    def snapshot(self) -> dict[str, float]:
        return dict(self.free_at)

    def snapshot_headroom(self) -> dict[str, float]:
        """Checkpoint form: per-host REMAINING delay (free_at − now).
        Relative, so it survives a process restart where the monotonic
        clock resets; hosts at/under budget (headroom ≤ 0) are dropped —
        they restore to 'free now', which is exactly their state."""
        now = time.monotonic()
        return {h: t - now for h, t in self.free_at.items() if t > now}

    def restore_headroom(self, headroom: dict[str, float]) -> None:
        now = time.monotonic()
        for h, d in headroom.items():
            self.free_at[h] = now + d


class PolitenessService:
    def __init__(self, n_shards: int, rps_per_host: float, burst: int = 1,
                 backoff_factor: float = 1.0,
                 backoff_cap_mult: float = 16.0):
        self.n = n_shards
        self.rps = rps_per_host
        # politeness off (synthetic-fetch benches) ⇒ no shard actors at
        # all: don't reserve CPU for a service that is never called
        self.shards = ([] if rps_per_host >= 1e8 else
                       [PolitenessShard.remote(rps_per_host, burst,
                                               backoff_factor,
                                               backoff_cap_mult)
                        for _ in range(n_shards)])

    def acquire(self, host: str, n: int) -> float:
        """Blocking helper: books n slots, sleeps the mandated delay."""
        if self.rps >= 1e8:
            return 0.0  # politeness disabled (synthetic fetch)
        import zlib

        shard = self.shards[zlib.crc32(host.encode()) % self.n]
        delay = ray.get(shard.acquire.remote(host, n))
        if delay > 0:
            time.sleep(delay)
        return delay

    def book(self, counts: dict[str, int]) -> dict[str, float]:
        """Book ``counts[h]`` slots for every host in ONE round of shard
        RPCs; returns per host ``(delay until its FIRST booked slot,
        per-request spacing)`` — no sleeping here. Callers turn the
        bookings into per-request due times (first + k·spacing) and
        process requests in due order, so a batch holding several hosts
        paces them CONCURRENTLY on one task (span = max over hosts, not
        sum over hosts) while every request still lands on or after its
        booked slot. Spacing comes from the shard so a backoff-penalised
        host is paced at its widened interval, not the base one."""
        if self.rps >= 1e8 or not counts:
            return dict.fromkeys(counts, (0.0, 0.0))
        import zlib

        hosts = list(counts)
        futs = [self.shards[zlib.crc32(h.encode()) % self.n]
                .book.remote(h, counts[h]) for h in hosts]
        return dict(zip(hosts, ray.get(futs)))

    def set_min_spacing(self, host: str, interval: float) -> None:
        """Propagate a robots.txt Crawl-delay to the host's shard (one
        RPC, awaited so the next ``book`` on this actor sees it). Called
        once per (host, fetch actor) — the robots cache above gates it."""
        if self.rps >= 1e8 or not self.shards:
            return
        import zlib

        shard = self.shards[zlib.crc32(host.encode()) % self.n]
        ray.get(shard.set_min_spacing.remote(host, interval))

    def report(self, stats: dict[str, tuple[int, int]]) -> None:
        """Per-batch failure/success outcome per host → the shards'
        adaptive backoff. One RPC round, only called when backoff is
        configured (CrawlConfig.backoff_factor > 1)."""
        if self.rps >= 1e8 or not stats:
            return
        import zlib

        ray.get([self.shards[zlib.crc32(h.encode()) % self.n]
                 .report.remote(h, nf, nk) for h, (nf, nk) in stats.items()])

    def dump_headroom(self) -> dict[str, float]:
        """One host→remaining-delay map for the crawl checkpoint (the
        north_star's 'per-host budgets' state). Shard-count independent:
        the map is re-sharded on restore with the same crc32 routing
        ``acquire`` uses, so a resume with a different shard count still
        enforces every budget. Empty when politeness is disabled."""
        if not self.shards:
            return {}
        merged: dict[str, float] = {}
        for blob in ray.get([s.snapshot_headroom.remote()
                             for s in self.shards]):
            merged.update(blob)
        return merged

    def restore_headroom(self, headroom: dict[str, float]) -> None:
        if isinstance(headroom, list):  # legacy per-shard-list checkpoint
            merged: dict[str, float] = {}
            for blob in headroom:
                merged.update(blob)
            headroom = merged
        if not self.shards or not headroom:
            return
        import zlib

        per_shard: list[dict[str, float]] = [{} for _ in self.shards]
        for host, delay in headroom.items():
            per_shard[zlib.crc32(host.encode()) % self.n][host] = delay
        ray.get([s.restore_headroom.remote(b)
                 for s, b in zip(self.shards, per_shard) if b])


def parse_robots(text: str) -> list[str]:
    """Minimal robots.txt: Disallow prefixes for User-agent: * groups."""
    prefixes: list[str] = []
    active = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif key == "disallow" and active and val:
            prefixes.append(val)
    return prefixes


def path_allowed(url: str, prefixes: list[str]) -> bool:
    i = url.find("://")
    j = url.find("/", i + 3 if i >= 0 else 0)
    path = url[j:] if j >= 0 else "/"
    return not any(path.startswith(p) for p in prefixes)
