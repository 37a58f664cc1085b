"""Tenant / dataset / API-key provisioning catalog.

The reference keeps provisioning state in a catalog database
(src/common/src/catalog.rs — TenantRecord :1273, DatasetRecord :1308,
ApiKeyRecord :1284) behind the admin endpoints
(src/router/src/endpoints/admin.rs): tenant creation validates
id/name, 409s on conflict, and materializes the default dataset in the
same transaction (a tenant without a dataset row fails closed — its
issue #1066); API keys are stored as SHA-256 hashes only
(catalog.rs hash_api_key), returned in plaintext exactly once at
creation, and revocation is a timestamp, not a delete.

Here the catalog is an immutable versioned JSON document under
``{base}/_catalog/`` committed with the same put-if-absent protocol
the manifest and index stores use (``os.link`` locally ≙ conditional
PUT on an object store): concurrent writers race safely by re-reading
the latest version and retrying, readers always see a complete
document, and history is auditable. Data paths are untouched — a
tenant's tables still live at ``{base}/{tenant}/{dataset}/{table}``,
so provisioning and the query engine compose through the path layout
alone.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import os
import secrets
import uuid


class AdminError(Exception):
    def __init__(self, code: str, message: str):
        super().__init__(message)
        self.code = code
        self.message = message


def _hash_key(key: str) -> str:
    return hashlib.sha256(key.encode("utf-8")).hexdigest()


def _now_iso(now) -> str:
    if now is None:
        now = dt.datetime.now(dt.timezone.utc)
    elif isinstance(now, str):
        return now
    return now.isoformat()


class TenantCatalog:
    """Provisioning state machine over a versioned JSON document."""

    def __init__(self, base: str):
        self.dir = os.path.join(base, "_catalog")

    # ------------------------------------------------------- versioning

    def versions(self) -> list[int]:
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

    def _read_versioned(self) -> tuple[dict, int]:
        """(document, version) from ONE listing — the version the commit
        must link at +1. Computing the target version from a second
        listing would let a concurrent commit land in between and be
        silently overwritten (lost update) instead of colliding."""
        vs = self.versions()
        if not vs:
            return {"tenants": {}, "api_keys": {}}, 0
        with open(os.path.join(self.dir, f"v{vs[-1]:08d}.json")) as fh:
            return json.load(fh), vs[-1]

    def _read(self) -> dict:
        return self._read_versioned()[0]

    def _commit(self, mutate, max_retries: int = 20):
        """Read-latest → mutate → put-if-absent at read-version + 1.
        ``mutate`` receives the document and returns the method's result
        value; a FileExistsError means another writer committed first —
        the whole cycle re-runs against the fresh document (so conflict
        checks re-validate too)."""
        os.makedirs(self.dir, exist_ok=True)
        for _ in range(max_retries):
            doc, read_v = self._read_versioned()
            result = mutate(doc)
            tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(doc, fh, indent=1, sort_keys=True)
            try:
                os.link(tmp, os.path.join(self.dir, f"v{read_v + 1:08d}.json"))
                return result
            except FileExistsError:
                continue
            finally:
                os.unlink(tmp)
        raise AdminError("contention", f"catalog commit exceeded {max_retries} retries")

    # ---------------------------------------------------------- tenants

    def create_tenant(self, tenant_id: str, name: str,
                      default_dataset: str = "default", now=None) -> dict:
        """409-on-conflict create; the default dataset materializes in
        the SAME commit (admin.rs: a tenant without a dataset row is
        invisible and cannot authenticate — issue #1066 parity)."""
        if not tenant_id:
            raise AdminError("validation_error", "Tenant ID must not be empty")
        if not name:
            raise AdminError("validation_error", "Tenant name must not be empty")
        ts = _now_iso(now)

        def mutate(doc):
            if tenant_id in doc["tenants"]:
                raise AdminError("conflict", f"Tenant '{tenant_id}' already exists")
            rec = {
                "id": tenant_id, "name": name,
                "default_dataset": default_dataset,
                "created_at": ts, "updated_at": ts,
                "datasets": {
                    default_dataset: {"id": default_dataset, "name": default_dataset,
                                      "created_at": ts},
                },
            }
            doc["tenants"][tenant_id] = rec
            return rec

        return self._commit(mutate)

    def get_tenant(self, tenant_id: str) -> dict | None:
        return self._read()["tenants"].get(tenant_id)

    def set_tenant_limits(self, tenant_id: str, **limits) -> dict:
        """Per-tenant quotas and rate limits (config TenantLimits, issue
        #610 + ratelimit.rs lineage): max_api_keys / max_datasets /
        max_storage_bytes counts, plus the token-bucket rates
        max_ingest_requests_per_sec / max_ingest_bytes_per_sec /
        max_query_requests_per_sec and the burst_seconds allowance
        (float, ≥1.0 effective). Unset (None) means unlimited; passing
        None clears a limit."""
        allowed = {
            "max_api_keys", "max_datasets", "max_storage_bytes",
            "max_ingest_requests_per_sec", "max_ingest_bytes_per_sec",
            "max_query_requests_per_sec", "burst_seconds",
        }
        bad = set(limits) - allowed
        if bad:
            raise AdminError("validation_error", f"unknown limits: {sorted(bad)}")

        # Rate keys are stored as FLOATS (0.5 req/s is a valid slow
        # rate; int() would truncate it to a zero-capacity bucket that
        # rejects everything) and must be positive — a zero or negative
        # rate is total denial masquerading as a limit, which the
        # validation wall rejects instead of storing.
        rate_keys = {"max_ingest_requests_per_sec", "max_ingest_bytes_per_sec",
                     "max_query_requests_per_sec", "burst_seconds"}
        for k, v in limits.items():
            if v is None:
                continue
            try:
                if k in rate_keys:
                    if not float(v) > 0:
                        raise AdminError(
                            "validation_error",
                            f"{k} must be positive, got {v!r}")
                elif int(v) < 0:
                    raise AdminError(
                        "validation_error", f"{k} must be >= 0, got {v!r}")
            except (TypeError, ValueError):
                raise AdminError(
                    "validation_error", f"{k} must be numeric, got {v!r}")

        def mutate(doc):
            t = doc["tenants"].get(tenant_id)
            if t is None:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            cur = t.setdefault("limits", {})
            for k, v in limits.items():
                if v is None:
                    cur.pop(k, None)
                elif k in rate_keys:
                    cur[k] = float(v)
                else:
                    cur[k] = int(v)
            return dict(cur)

        return self._commit(mutate)

    def limits_for(self, tenant_id: str) -> dict:
        t = self.get_tenant(tenant_id)
        return dict((t or {}).get("limits") or {})

    def list_tenants(self) -> list[dict]:
        return sorted(self._read()["tenants"].values(), key=lambda t: t["id"])

    def delete_tenant(self, tenant_id: str) -> None:
        """Removes the tenant record, revokes its keys, and drops its
        membership rows in the SAME commit — otherwise a user whose
        sole membership pointed here would keep auto-resolving logins
        to the dead tenant id. Table data under the tenant's path is
        retention's job, not the catalog's."""
        def mutate(doc):
            if tenant_id not in doc["tenants"]:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            del doc["tenants"][tenant_id]
            for k in doc["api_keys"].values():
                if k["tenant_id"] == tenant_id and k.get("revoked_at") is None:
                    k["revoked_at"] = _now_iso(None)
            ms = doc.get("memberships") or {}
            for key in [k for k, m in ms.items()
                        if m["tenant_id"] == tenant_id]:
                del ms[key]
            return None

        return self._commit(mutate)

    # --------------------------------------------------------- datasets

    def create_dataset(self, tenant_id: str, name: str, now=None) -> dict:
        if not name:
            raise AdminError("validation_error", "Dataset name must not be empty")
        ts = _now_iso(now)

        def mutate(doc):
            t = doc["tenants"].get(tenant_id)
            if t is None:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            if name in t["datasets"]:
                raise AdminError("conflict", f"Dataset '{name}' already exists")
            max_ds = (t.get("limits") or {}).get("max_datasets")
            if max_ds is not None and len(t["datasets"]) >= max_ds:
                raise AdminError(
                    "quota_exceeded",
                    f"Tenant '{tenant_id}' already has {len(t['datasets'])} "
                    f"datasets (limit {max_ds}); delete a dataset or raise "
                    f"max_datasets",
                )
            rec = {"id": name, "name": name, "created_at": ts}
            t["datasets"][name] = rec
            return rec

        return self._commit(mutate)

    def list_datasets(self, tenant_id: str) -> list[dict]:
        t = self.get_tenant(tenant_id)
        if t is None:
            raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
        return sorted(t["datasets"].values(), key=lambda d: d["id"])

    def delete_dataset(self, tenant_id: str, name: str) -> None:
        def mutate(doc):
            t = doc["tenants"].get(tenant_id)
            if t is None or name not in t["datasets"]:
                raise AdminError("not_found", f"Dataset '{name}' not found")
            if t.get("default_dataset") == name:
                raise AdminError("validation_error",
                                 "cannot delete the tenant's default dataset")
            del t["datasets"][name]
            return None

        return self._commit(mutate)

    # --------------------------------------------------------- API keys

    def create_api_key(self, tenant_id: str, name: str | None = None,
                       dataset: str | None = None, key: str | None = None,
                       now=None) -> dict:
        """Mint a key for a tenant (optionally pinned to one dataset).
        The plaintext is returned ONCE here; only its SHA-256 persists
        (catalog.rs hash_api_key). Pass ``key`` to make tests
        deterministic."""
        plaintext = key or f"sk_{secrets.token_hex(24)}"
        key_id = f"key_{uuid.uuid4().hex[:12]}"
        ts = _now_iso(now)

        def mutate(doc):
            t = doc["tenants"].get(tenant_id)
            if t is None:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            if dataset is not None and dataset not in t["datasets"]:
                raise AdminError("not_found", f"Dataset '{dataset}' not found")
            if _hash_key(plaintext) in doc["api_keys"]:
                # a reused plaintext would silently re-bind the existing
                # credential to this tenant and destroy its record
                raise AdminError("conflict", "API key already exists")
            max_keys = (t.get("limits") or {}).get("max_api_keys")
            if max_keys is not None:
                active = sum(
                    1 for k in doc["api_keys"].values()
                    if k["tenant_id"] == tenant_id and k["revoked_at"] is None
                )
                if active >= max_keys:
                    raise AdminError(
                        "quota_exceeded",
                        f"Tenant '{tenant_id}' already has {active} active "
                        f"API keys (limit {max_keys}); revoke a key or raise "
                        f"max_api_keys",
                    )
            doc["api_keys"][_hash_key(plaintext)] = {
                "id": key_id, "tenant_id": tenant_id, "name": name,
                "dataset_id": dataset, "created_at": ts, "revoked_at": None,
            }
            return {"id": key_id, "tenant_id": tenant_id, "name": name,
                    "dataset_id": dataset, "created_at": ts, "key": plaintext}

        return self._commit(mutate)

    def list_api_keys(self, tenant_id: str) -> list[dict]:
        """Key records WITHOUT plaintext or hashes (ApiKeyRecord shape)."""
        return sorted(
            (dict(v) for v in self._read()["api_keys"].values()
             if v["tenant_id"] == tenant_id),
            key=lambda k: k["id"],
        )

    def revoke_api_key(self, tenant_id: str, key_id: str, now=None) -> None:
        ts = _now_iso(now)

        def mutate(doc):
            for rec in doc["api_keys"].values():
                if rec["tenant_id"] == tenant_id and rec["id"] == key_id:
                    if rec["revoked_at"] is not None:
                        raise AdminError("conflict", "key already revoked")
                    rec["revoked_at"] = ts
                    return None
            raise AdminError("not_found", f"API key '{key_id}' not found")

        return self._commit(mutate)

    def authenticate(self, key: str) -> dict | None:
        """Plaintext key → (tenant, dataset) auth attributes, or None.
        Fails closed: unknown, revoked, and deleted-tenant keys all
        return None (resolve_database_tenant semantics — a tenant whose
        dataset row is gone cannot authenticate)."""
        doc = self._read()
        rec = doc["api_keys"].get(_hash_key(key))
        if rec is None or rec["revoked_at"] is not None:
            return None
        t = doc["tenants"].get(rec["tenant_id"])
        if t is None:
            return None
        dataset = rec["dataset_id"] or t.get("default_dataset")
        if dataset not in t["datasets"]:
            return None
        return {"tenant_id": rec["tenant_id"], "dataset": dataset,
                "key_id": rec["id"]}

    # ----------------------------------------------- users + memberships
    #
    # Reference: endpoints/admin.rs create_user (validation: non-empty
    # email, password >= 12 chars, role in {admin, member, viewer};
    # tenant must exist; duplicate email is a conflict; only a hash of
    # the password is stored), endpoints/management.rs
    # list/upsert/remove_membership (active-user lookup by email, the
    # last-administrator guards, the self-removal guard), and
    # endpoints/session.rs create_session (tenant resolution against
    # memberships; instance admins may pick any tenant). The reference
    # creates the user and grants the membership in two catalog calls —
    # here both land in ONE versioned commit, so a crash between them
    # cannot leave a user with no membership.

    ROLES = ("admin", "member", "viewer")

    @staticmethod
    def _canon_email(email: str) -> str:
        """Email is the login identity and is CASE-INSENSITIVE: trimmed
        + lowercased at account creation and at every lookup, with
        uniqueness on the canonical form (ADR users-tenant-membership —
        canonicalizing in the application keeps identity semantics
        identical across catalog backends)."""
        return (email or "").strip().lower()

    @staticmethod
    def _hash_password(password: str, salt: str | None = None) -> str:
        """scrypt KDF, ``salt$hash`` on disk — plaintext never persists
        (admin.rs hashes off-thread before the catalog sees it; the
        exact KDF there is an implementation detail)."""
        salt = salt or secrets.token_hex(16)
        h = hashlib.scrypt(password.encode("utf-8"), salt=bytes.fromhex(salt),
                           n=2 ** 12, r=8, p=1)
        return f"{salt}${h.hex()}"

    @classmethod
    def _verify_password(cls, password: str, stored: str) -> bool:
        salt = stored.split("$", 1)[0]
        return secrets.compare_digest(cls._hash_password(password, salt), stored)

    def create_user(self, email: str, password: str, tenant_id: str,
                    role: str = "member", display_name: str | None = None,
                    instance_admin: bool = False, now=None) -> dict:
        email = self._canon_email(email)
        if not email:
            raise AdminError("validation_error", "email must not be empty")
        if len(password) < 12:
            raise AdminError("validation_error",
                             "password must be at least 12 characters")
        if role not in self.ROLES:
            raise AdminError(
                "validation_error",
                f"invalid role '{role}': expected admin, member, or viewer")
        ts = _now_iso(now)
        user_id = f"user_{uuid.uuid4().hex[:12]}"
        pw_hash = self._hash_password(password)

        def mutate(doc):
            if tenant_id not in doc["tenants"]:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            users = doc.setdefault("users", {})
            if any(u["email"] == email for u in users.values()):
                raise AdminError("conflict", f"User '{email}' already exists")
            users[user_id] = {
                "id": user_id, "email": email, "display_name": display_name,
                "password_hash": pw_hash, "instance_admin": bool(instance_admin),
                "created_at": ts, "disabled_at": None,
            }
            doc.setdefault("memberships", {})[f"{user_id}|{tenant_id}"] = {
                "user_id": user_id, "tenant_id": tenant_id, "role": role,
            }
            return {"id": user_id, "email": email,
                    "display_name": display_name,
                    "instance_admin": bool(instance_admin), "created_at": ts}

        return self._commit(mutate)

    def get_user(self, user_id: str) -> dict | None:
        return (self._read().get("users") or {}).get(user_id)

    def get_user_by_email(self, email: str) -> dict | None:
        email = self._canon_email(email)
        for u in (self._read().get("users") or {}).values():
            if u["email"] == email:
                return u
        return None

    def disable_user(self, user_id: str, now=None) -> None:
        """Disabled users fail membership upserts and session creation
        (management.rs / session.rs check ``disabled_at`` is unset)."""
        ts = _now_iso(now)

        def mutate(doc):
            u = (doc.get("users") or {}).get(user_id)
            if u is None:
                raise AdminError("not_found", f"User '{user_id}' not found")
            u["disabled_at"] = ts
            return None

        return self._commit(mutate)

    def _members_of(self, doc: dict, tenant_id: str) -> list[dict]:
        return [m for m in (doc.get("memberships") or {}).values()
                if m["tenant_id"] == tenant_id]

    def list_memberships(self, tenant_id: str) -> list[dict]:
        """(user_id, email, role) rows; memberships whose user record is
        gone are skipped, not errors (management.rs list_memberships
        ``Ok(None) => continue``)."""
        doc = self._read()
        if tenant_id not in doc["tenants"]:
            raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
        users = doc.get("users") or {}
        out = []
        for m in self._members_of(doc, tenant_id):
            u = users.get(m["user_id"])
            if u is None:
                continue
            out.append({"user_id": u["id"], "email": u["email"],
                        "role": m["role"]})
        return sorted(out, key=lambda r: (r["email"], r["user_id"]))

    def upsert_membership(self, tenant_id: str, email: str, role: str) -> dict:
        """Grant or change a user's role. Demoting the LAST administrator
        is a conflict (management.rs: the admin-count guard runs only
        when the new role is not admin)."""
        if role not in self.ROLES:
            raise AdminError(
                "validation_error",
                f"invalid role '{role}': expected admin, member, or viewer")
        email = self._canon_email(email)

        def mutate(doc):
            if tenant_id not in doc["tenants"]:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            user = next(
                (u for u in (doc.get("users") or {}).values()
                 if u["email"] == email and u["disabled_at"] is None),
                None,
            )
            if user is None:
                raise AdminError("not_found", "Active user not found")
            members = self._members_of(doc, tenant_id)
            if role != "admin":
                target_is_admin = any(
                    m["user_id"] == user["id"] and m["role"] == "admin"
                    for m in members)
                admin_count = sum(1 for m in members if m["role"] == "admin")
                if target_is_admin and admin_count == 1:
                    raise AdminError(
                        "conflict",
                        "The last tenant administrator cannot be demoted")
            doc.setdefault("memberships", {})[f"{user['id']}|{tenant_id}"] = {
                "user_id": user["id"], "tenant_id": tenant_id, "role": role,
            }
            return {"user_id": user["id"], "email": user["email"],
                    "role": role}

        return self._commit(mutate)

    def remove_membership(self, tenant_id: str, user_id: str,
                          actor_user_id: str | None = None) -> None:
        """Self-removal is a validation error; removing the last
        administrator is a conflict; removing an absent membership is a
        no-op success (management.rs remove_membership)."""
        if actor_user_id is not None and actor_user_id == user_id:
            raise AdminError("validation_error",
                             "You cannot remove your own active membership")

        def mutate(doc):
            if tenant_id not in doc["tenants"]:
                raise AdminError("not_found", f"Tenant '{tenant_id}' not found")
            members = self._members_of(doc, tenant_id)
            target_is_admin = any(
                m["user_id"] == user_id and m["role"] == "admin"
                for m in members)
            admin_count = sum(1 for m in members if m["role"] == "admin")
            if target_is_admin and admin_count == 1:
                raise AdminError(
                    "conflict",
                    "The last tenant administrator cannot be removed")
            (doc.get("memberships") or {}).pop(f"{user_id}|{tenant_id}", None)
            return None

        return self._commit(mutate)

    SESSION_TTL_SECONDS = 12 * 3600

    @staticmethod
    def _as_dt(now) -> dt.datetime:
        if now is None:
            return dt.datetime.now(dt.timezone.utc)
        if isinstance(now, str):
            return dt.datetime.fromisoformat(now)
        return now

    def _memberships_for(self, doc: dict, user_id: str) -> list[dict]:
        return sorted(
            ({"tenant_id": m["tenant_id"], "role": m["role"]}
             for m in (doc.get("memberships") or {}).values()
             if m["user_id"] == user_id),
            key=lambda m: m["tenant_id"],
        )

    def create_session(self, email: str, password: str,
                       tenant: str | None = None, now=None,
                       ttl_seconds: int | None = None) -> dict:
        """UI login (session.rs create_session + the users ADR session
        contract): invalid or disabled credentials are indistinguishable
        ('Invalid email or password'); an explicit tenant must be among
        the user's memberships unless the user is an instance admin;
        with no explicit tenant a sole membership auto-selects and
        multiple memberships defer the pick (tenant None); zero
        memberships is forbidden. The response always carries the
        memberships. A FRESH opaque token is issued on every login and
        returned exactly once; only its SHA-256 lands in the catalog
        (high-entropy random tokens keep the unsalted-hash idiom the
        ADR reserves for them), with a bounded absolute lifetime."""
        user = self.get_user_by_email(email)
        if user is None or user["disabled_at"] is not None \
                or not self._verify_password(password, user["password_hash"]):
            raise AdminError("unauthorized", "Invalid email or password")
        doc = self._read()
        memberships = self._memberships_for(doc, user["id"])
        if tenant is not None:
            if not user["instance_admin"] and not any(
                    m["tenant_id"] == tenant for m in memberships):
                raise AdminError("forbidden",
                                 "User is not a member of this tenant")
            resolved = tenant
        elif not memberships:
            raise AdminError("forbidden", "User has no tenant memberships")
        elif len(memberships) == 1:
            resolved = memberships[0]["tenant_id"]
        else:
            resolved = None
        token = f"sess_{secrets.token_hex(32)}"
        created = self._as_dt(now)
        expires = created + dt.timedelta(
            seconds=self.SESSION_TTL_SECONDS if ttl_seconds is None
            else ttl_seconds)
        sess_id = f"sess_{uuid.uuid4().hex[:12]}"

        def mutate(d):
            d.setdefault("sessions", {})[_hash_key(token)] = {
                "id": sess_id, "user_id": user["id"],
                "created_at": created.isoformat(),
                "expires_at": expires.isoformat(), "revoked_at": None,
            }
            return None

        self._commit(mutate)
        return {"user_id": user["id"], "email": user["email"],
                "tenant": resolved, "memberships": memberships,
                "token": token, "expires_at": expires.isoformat()}

    def validate_session(self, token: str, now=None) -> dict | None:
        """Session-cookie validation → the whoami payload, or None.
        Fails closed: unknown, revoked, and expired tokens all read the
        same, and a disabled user invalidates every existing session at
        the next request (the lookup joins users, per the ADR — no
        per-session revocation needed)."""
        doc = self._read()
        rec = (doc.get("sessions") or {}).get(_hash_key(token))
        if rec is None or rec["revoked_at"] is not None:
            return None
        if self._as_dt(now) >= dt.datetime.fromisoformat(rec["expires_at"]):
            return None
        user = (doc.get("users") or {}).get(rec["user_id"])
        if user is None or user["disabled_at"] is not None:
            return None
        return {"user_id": user["id"], "email": user["email"],
                "display_name": user["display_name"],
                "instance_admin": user["instance_admin"],
                "memberships": self._memberships_for(doc, user["id"])}

    def revoke_session(self, token: str, now=None) -> None:
        """Logout: server-side revocation (the raw-key cookie the ADR
        replaces could not be invalidated). Revoking an unknown or
        already-revoked token is a no-op success, like the reference's
        DELETE returning 204 regardless."""
        ts = _now_iso(now)

        def mutate(doc):
            rec = (doc.get("sessions") or {}).get(_hash_key(token))
            if rec is not None and rec["revoked_at"] is None:
                rec["revoked_at"] = ts
            return None

        return self._commit(mutate)
