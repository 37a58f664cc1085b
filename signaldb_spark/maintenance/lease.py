"""Work-unit leases for multi-instance compactor coordination.

When several compactor instances run at once, a lease ensures only one
compacts a given work unit (tenant/dataset/table/partition) at a time
(src/compactor/src/lease/mod.rs). The reference stores leases in its
SQL catalog with an atomic ``INSERT … ON CONFLICT DO UPDATE WHERE
expires_at < now``; the properties that matter are

- only one instance holds a non-expired lease per unit,
- expired leases (crashed holders) are taken over automatically,
- acquire/renew/release are each a single round-trip.

This analog stores one JSON object per unit under ``<base>/_leases/``
and gets atomicity from create-if-not-exists (``os.link`` — the POSIX
analog of an object store's conditional PUT / If-None-Match, the same
primitive storage.manifest uses for snapshot commits). Takeover of an
expired lease is a delete-then-create race where ties are broken by the
create: at most one contender's link succeeds.

The clock is injectable so expiry/takeover are deterministically
testable.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

LEASE_DIR = "_leases"


@dataclass(frozen=True)
class Lease:
    """An active lease on one compaction work unit — release (or let
    expire) when done (compactor::lease::Lease)."""

    unit: str
    holder_id: str
    acquired_at: float
    expires_at: float
    token: str  # unique per grant: release/renew verify ownership


def partition_unit(tenant: str, dataset: str, table: str, day: str, hour: int) -> str:
    """Canonical work-unit key for one hour partition."""
    return f"{tenant}.{dataset}.{table}.{day}.{hour:02d}"


class LeaseManager:
    def __init__(
        self,
        base: str,
        holder_id: str | None = None,
        ttl_seconds: float = 300.0,
        now=time.time,
    ):
        self.base = base
        self.holder_id = holder_id or uuid.uuid4().hex
        self.ttl = ttl_seconds
        self.now = now
        self.lease_dir = os.path.join(base, LEASE_DIR)

    def _path(self, unit: str) -> str:
        return os.path.join(self.lease_dir, f"{unit}.json")

    def _read(self, unit: str) -> dict | None:
        try:
            with open(self._path(unit)) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            # a JSON parse error can only be a torn takeover (unlink won
            # but the new link hasn't landed) — treat as absent
            return None

    def _try_link(self, unit: str, doc: dict) -> bool:
        os.makedirs(self.lease_dir, exist_ok=True)
        tmp = os.path.join(self.lease_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        try:
            os.link(tmp, self._path(unit))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def try_acquire(self, unit: str) -> Lease | None:
        """Acquire the unit's lease, taking over an expired one; None if
        another instance holds it live (LeaseManager::try_acquire)."""
        t = self.now()
        doc = {
            "unit": unit,
            "holder_id": self.holder_id,
            "acquired_at": t,
            "expires_at": t + self.ttl,
            "token": uuid.uuid4().hex,
        }
        if self._try_link(unit, doc):
            return Lease(**doc)
        cur = self._read(unit)
        if cur is not None and cur["expires_at"] > t:
            return None  # held and live
        # expired (or torn): clear and race on the create — exactly one
        # contender's link succeeds
        try:
            os.unlink(self._path(unit))
        except FileNotFoundError:
            pass
        if self._try_link(unit, doc):
            return Lease(**doc)
        return None

    def _owns(self, lease: Lease) -> bool:
        cur = self._read(lease.unit)
        return cur is not None and cur.get("token") == lease.token

    def renew(self, lease: Lease) -> Lease | None:
        """Extend a held lease's expiry; None if the lease was lost
        (expired and taken over) — the holder must stop its work.

        Check-then-replace, not CAS: safe while the holder renews before
        expiry (the reference renews at ttl/2 for the same reason) —
        takeover is only possible after expiry, and a holder that
        observes a lost lease must abandon the unit."""
        if not self._owns(lease):
            return None
        t = self.now()
        doc = {
            "unit": lease.unit,
            "holder_id": lease.holder_id,
            "acquired_at": lease.acquired_at,
            "expires_at": t + self.ttl,
            "token": lease.token,
        }
        tmp = os.path.join(self.lease_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, self._path(lease.unit))  # atomic in-place update
        return Lease(**doc)

    def release(self, lease: Lease) -> None:
        """Drop the lease so other instances can claim the unit; a lost
        lease is a no-op (someone else already owns the file)."""
        if self._owns(lease):
            try:
                os.unlink(self._path(lease.unit))
            except FileNotFoundError:
                pass
