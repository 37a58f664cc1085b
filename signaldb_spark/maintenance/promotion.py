"""Attribute auto-promotion with persisted streak hysteresis.

The stateful caller the reference wires around its pure decision
function (src/compactor/src/attr_promotion.rs:82-153): per-key streak
counters persist across maintenance cycles, a key must stay over
threshold for ``promote_streak`` CONSECUTIVE cycles before promotion
(one bad scrape can't thrash the schema), and promotions respect both a
table width budget and a per-cycle cap. Demotion is the mirror: an
auto-promoted, unpinned column whose recorded query demand has dropped
to zero becomes a demote candidate; pinned labels are never demoted.

State is a single JSON object per table (key → streak), bounded by the
number of distinct attribute keys — catalog metadata, not data. It
persists through the same put-if-absent versioned-manifest protocol as
table commits (storage.manifest), so concurrent maintenance instances
can't silently clobber each other's cycle.

The stats input is the ``attribute_stats`` DataFrame (bounded:
one row per attribute key); the collect here is catalog-sized, never
corpus-sized.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PromotionConfig:
    """Guardrails (attr_promotion.rs AttrPromotionConfig shape)."""

    min_demand: int = 1
    min_presence_ratio: float = 0.1
    promote_streak: int = 3
    max_labels_per_table: int = 16
    max_promotions_per_cycle: int = 4
    # keys whose distinct-value tracking hit the analyzer cap are never
    # promoted (runaway cardinality)
    cardinality_cap: int = 100_000


@dataclass
class PromotionDecision:
    promote: list[str] = field(default_factory=list)
    demote: list[str] = field(default_factory=list)
    building: list[tuple[str, int]] = field(default_factory=list)


def looks_generated(key: str) -> bool:
    """Machine-generated key heuristic (attr_promotion.rs:53-75
    behavior): UUID-ish hex runs of 12+ or digit runs of 8+ anywhere in
    the key mean promotion would grow the schema without reusable query
    value."""
    lower = key.lower()
    hex_run = digit_run = 0
    for ch in lower:
        if ch.isdigit():
            digit_run += 1
            hex_run += 1
        elif ch in "abcdef":
            hex_run += 1
            digit_run = 0
        else:
            hex_run = digit_run = 0
        if digit_run >= 8 or hex_run >= 12:
            return True
    return False


class StreakStore:
    """Versioned per-table streak state: ``_promotion/v<N>.json`` under
    the table path, committed via put-if-absent (os.link — the same
    conditional-PUT analog as the table manifests), so a racing
    maintenance instance loses the version race loudly and retries from
    fresh state instead of overwriting."""

    def __init__(self, table_path: str):
        self.dir = os.path.join(table_path, "_promotion")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        out = []
        for n in os.listdir(self.dir):
            if n.startswith("v") and n.endswith(".json"):
                try:
                    out.append(int(n[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def load(self) -> dict[str, int]:
        vs = self._versions()
        if not vs:
            return {}
        with open(os.path.join(self.dir, f"v{vs[-1]:08d}.json")) as fh:
            return json.load(fh)

    def save(self, streaks: dict[str, int], max_retries: int = 20) -> None:
        os.makedirs(self.dir, exist_ok=True)
        # streak 0 entries are dropped — absent means zero
        clean = {k: v for k, v in streaks.items() if v > 0}
        for _ in range(max_retries):
            version = (self._versions() or [0])[-1] + 1
            tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(clean, fh, sort_keys=True)
            try:
                os.link(tmp, os.path.join(self.dir, f"v{version:08d}.json"))
                return
            except FileExistsError:
                continue
            finally:
                os.unlink(tmp)
        raise RuntimeError("streak store contention")


def promotion_cycle(
    stats: DataFrame,
    store: StreakStore,
    demand: dict[str, int],
    materialized: tuple[str, ...] = (),
    pinned: tuple[str, ...] = (),
    config: PromotionConfig | None = None,
) -> PromotionDecision:
    """One hysteresis cycle: update streaks from this cycle's stats ×
    demand, then decide.

    - over-threshold = demand ≥ min_demand AND presence_ratio ≥
      min_presence_ratio AND not generated-looking AND cardinality under
      the cap AND not already materialized/pinned;
    - streak increments while over threshold, RESETS TO ZERO the first
      cycle it isn't (attr_promotion.rs:100-106);
    - promote = over-threshold keys whose streak reached
      ``promote_streak``, highest demand×presence first, bounded by
      width headroom and the per-cycle cap;
    - demote = materialized, unpinned keys with zero demand this cycle.

    ``stats`` rows: (key, presence, cardinality|approx_cardinality,
    presence_ratio) — the attribute_stats output shape.
    """
    cfg = config or PromotionConfig()
    card_col = "cardinality" if "cardinality" in stats.columns else "approx_cardinality"
    rows = stats.select("key", card_col, "presence_ratio").collect()
    prev = store.load()
    new_streaks: dict[str, int] = {}
    eligible: list[tuple[str, float]] = []
    decision = PromotionDecision()
    seen = set()
    for r in rows:
        key = r["key"]
        seen.add(key)
        if key in materialized or key in pinned:
            continue
        over = (
            not looks_generated(key)
            and r[card_col] is not None
            and r[card_col] <= cfg.cardinality_cap
            and demand.get(key, 0) >= cfg.min_demand
            and r["presence_ratio"] >= cfg.min_presence_ratio
        )
        streak = prev.get(key, 0) + 1 if over else 0
        new_streaks[key] = streak
        if over and streak >= cfg.promote_streak:
            eligible.append((key, demand.get(key, 0) * r["presence_ratio"]))
        elif over:
            decision.building.append((key, streak))
    # keys absent from this cycle's stats lose their streak too
    for key in prev:
        if key not in seen:
            new_streaks[key] = 0
    store.save(new_streaks)

    width = len(set(materialized) | set(pinned))
    headroom = max(cfg.max_labels_per_table - width, 0)
    eligible.sort(key=lambda kv: (-kv[1], kv[0]))
    decision.promote = [
        k for k, _ in eligible[: min(headroom, cfg.max_promotions_per_cycle)]
    ]
    decision.demote = sorted(
        k for k in materialized if k not in pinned and demand.get(k, 0) == 0
    )
    return decision
