"""Provisioning catalog (admin.py + api.AdminAPI): tenant/dataset/
API-key CRUD semantics from the reference's admin endpoints —
409-on-conflict, atomic default-dataset materialization (issue #1066
parity), SHA-256-only key storage, fail-closed authentication — over
the put-if-absent versioned JSON commit."""

from __future__ import annotations

import glob
import json

import pytest

from signaldb_spark.admin import AdminError, TenantCatalog
from signaldb_spark.api import AdminAPI

NOW = "2024-01-01T00:00:00+00:00"


def test_create_tenant_materializes_default_dataset(tmp_path):
    cat = TenantCatalog(str(tmp_path))
    rec = cat.create_tenant("acme", "Acme Corp", now=NOW)
    assert rec["id"] == "acme" and rec["default_dataset"] == "default"
    # the dataset row exists in the SAME commit (one catalog version)
    assert cat.versions() == [1]
    assert [d["id"] for d in cat.list_datasets("acme")] == ["default"]


def test_create_tenant_validation_and_conflict(tmp_path):
    cat = TenantCatalog(str(tmp_path))
    with pytest.raises(AdminError, match="must not be empty"):
        cat.create_tenant("", "x")
    with pytest.raises(AdminError, match="must not be empty"):
        cat.create_tenant("t", "")
    cat.create_tenant("t", "T", now=NOW)
    with pytest.raises(AdminError, match="already exists"):
        cat.create_tenant("t", "T again")


def test_dataset_crud_and_default_protection(tmp_path):
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    cat.create_dataset("t", "staging", now=NOW)
    assert [d["id"] for d in cat.list_datasets("t")] == ["default", "staging"]
    with pytest.raises(AdminError, match="already exists"):
        cat.create_dataset("t", "staging")
    with pytest.raises(AdminError, match="default dataset"):
        cat.delete_dataset("t", "default")
    cat.delete_dataset("t", "staging")
    assert [d["id"] for d in cat.list_datasets("t")] == ["default"]
    with pytest.raises(AdminError, match="not found"):
        cat.create_dataset("nope", "x")


def test_api_key_lifecycle_and_fail_closed_auth(tmp_path):
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    minted = cat.create_api_key("t", name="ingest", key="sk_test_123", now=NOW)
    assert minted["key"] == "sk_test_123"

    # plaintext never persists — only the SHA-256 hash
    blobs = " ".join(
        open(p).read() for p in glob.glob(f"{tmp_path}/_catalog/*.json")
    )
    assert "sk_test_123" not in blobs

    auth = cat.authenticate("sk_test_123")
    assert auth == {"tenant_id": "t", "dataset": "default", "key_id": minted["id"]}
    assert cat.authenticate("sk_wrong") is None

    # record listing carries no secrets
    recs = cat.list_api_keys("t")
    assert len(recs) == 1 and "key" not in recs[0]

    cat.revoke_api_key("t", minted["id"], now=NOW)
    assert cat.authenticate("sk_test_123") is None
    with pytest.raises(AdminError, match="already revoked"):
        cat.revoke_api_key("t", minted["id"])


def test_dataset_scoped_key_and_tenant_delete_revokes(tmp_path):
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    cat.create_dataset("t", "prod", now=NOW)
    k = cat.create_api_key("t", dataset="prod", key="sk_prod", now=NOW)
    assert cat.authenticate("sk_prod")["dataset"] == "prod"
    with pytest.raises(AdminError, match="not found"):
        cat.create_api_key("t", dataset="missing")
    cat.delete_tenant("t")
    assert cat.authenticate("sk_prod") is None
    assert cat.get_tenant("t") is None and k["id"]


def test_delete_tenant_drops_memberships_and_sessions_follow(tmp_path):
    """delete_tenant removes the tenant's membership rows in the same
    commit: a user whose sole membership pointed at the deleted tenant
    must not keep auto-resolving logins to the dead tenant id, and
    whoami must stop reporting the membership (ADVICE round 5)."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("dead", "Dead", now=NOW)
    cat.create_tenant("live", "Live", now=NOW)
    u = cat.create_user("solo@x.io", "longpassword123", "dead")
    cat.create_user("both@x.io", "longpassword123", "dead")
    cat.upsert_membership("live", "both@x.io", "viewer")
    sess = cat.create_session("both@x.io", "longpassword123")

    cat.delete_tenant("dead")
    # sole-membership user: login is forbidden, not resolved to a ghost
    with pytest.raises(AdminError, match="no tenant memberships"):
        cat.create_session("solo@x.io", "longpassword123")
    assert cat._memberships_for(cat._read(), u["id"]) == []
    # multi-membership user now auto-resolves to the surviving tenant
    assert cat.create_session("both@x.io", "longpassword123")["tenant"] == "live"
    # an existing session's whoami no longer reports the dead tenant
    who = cat.validate_session(sess["token"])
    assert [m["tenant_id"] for m in who["memberships"]] == ["live"]


def test_catalog_versions_are_immutable_history(tmp_path):
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("a", "A", now=NOW)
    cat.create_tenant("b", "B", now=NOW)
    cat.create_dataset("a", "x", now=NOW)
    assert cat.versions() == [1, 2, 3]
    # two handles over the same directory see the same latest state
    other = TenantCatalog(str(tmp_path))
    assert {t["id"] for t in other.list_tenants()} == {"a", "b"}


def test_admin_api_envelopes(tmp_path):
    api = AdminAPI(str(tmp_path))
    out = api.create_tenant("acme", "Acme")
    assert out["status"] == "success" and out["data"]["id"] == "acme"
    dup = api.create_tenant("acme", "Acme")
    assert dup["status"] == "error" and dup["errorType"] == "conflict"
    missing = api.get_tenant("nope")
    assert missing["status"] == "error" and missing["errorType"] == "not_found"
    key = api.create_api_key("acme", name="ci")
    assert key["status"] == "success" and key["data"]["key"].startswith("sk_")
    ok = api.authenticate(key["data"]["key"])
    assert ok["status"] == "success" and ok["data"]["tenant_id"] == "acme"
    bad = api.authenticate("sk_nope")
    assert bad["status"] == "error" and bad["errorType"] == "unauthorized"
    assert api.list_tenants()["data"][0]["id"] == "acme"


def test_commit_version_comes_from_the_same_read(tmp_path, monkeypatch):
    """Lost-update guard: a commit that raced (another version landed
    after our read) must COLLIDE and retry, not link a fresh version
    built from the stale document. Simulated by injecting a competing
    commit between A's read and link."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    other = TenantCatalog(str(tmp_path))

    real = TenantCatalog._read_versioned
    fired = {"done": False}

    def race(self):
        doc, v = real(self)
        if not fired["done"]:
            fired["done"] = True
            other.create_api_key("t", key="sk_b", now=NOW)  # B lands first
        return doc, v

    monkeypatch.setattr(TenantCatalog, "_read_versioned", race)
    cat.create_api_key("t", key="sk_a", now=NOW)  # A retries, does not clobber B
    monkeypatch.setattr(TenantCatalog, "_read_versioned", real)
    assert cat.authenticate("sk_a") is not None
    assert cat.authenticate("sk_b") is not None  # B's key survived


def test_api_key_plaintext_reuse_conflicts(tmp_path):
    """The key store is keyed by hash(plaintext): minting the same
    plaintext again (even for another tenant) must refuse rather than
    silently re-bind the credential and destroy the first record."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("a", "A", now=NOW)
    cat.create_tenant("b", "B", now=NOW)
    cat.create_api_key("a", key="sk_shared", now=NOW)
    with pytest.raises(AdminError, match="already exists"):
        cat.create_api_key("b", key="sk_shared", now=NOW)
    ident = cat.authenticate("sk_shared")
    assert ident["tenant_id"] == "a"  # original binding intact


def test_tenant_tables_lifecycle(spark, tmp_path):
    """GET/POST /tenants/{id}/tables[/create] (endpoints/tenant.rs):
    listing is tenant-guarded; create materializes REAL empty manifest
    tables (tenant.rs:356-359 pins created-not-logged), is idempotent,
    and a provisioned table answers queries as empty-in-schema rather
    than not_found."""
    from signaldb_spark.catalog import optional_table

    api = AdminAPI(str(tmp_path))
    api.create_tenant("acme", "Acme")

    # cross-tenant context is refused before any filesystem access
    forbidden = api.list_tenant_tables("acme", ctx_tenant_id="evil")
    assert forbidden["status"] == "error" and forbidden["errorType"] == "forbidden"
    missing = api.list_tenant_tables("nope")
    assert missing["status"] == "error" and missing["errorType"] == "not_found"

    # nothing provisioned yet
    assert api.list_tenant_tables("acme")["data"]["tables"] == []

    # create requires the admin role
    denied = api.create_tenant_tables("acme", can_manage=False)
    assert denied["status"] == "error" and denied["errorType"] == "forbidden"

    out = api.create_tenant_tables("acme")
    assert out["status"] == "success"
    created = out["data"]["created"]
    assert "traces" in created and "logs" in created

    listed = api.list_tenant_tables("acme")["data"]["tables"]
    assert [t["name"] for t in listed] == sorted(created)
    by_name = {t["name"]: t for t in listed}
    assert by_name["logs"]["schema_type"] == "logs"
    assert "log entries" in by_name["logs"]["description"]

    # idempotent re-create: everything skipped, nothing re-created
    again = api.create_tenant_tables("acme")
    assert again["data"]["created"] == []
    assert sorted(again["data"]["skipped"]) == sorted(created)

    # a provisioned-but-empty table is QUERYABLE as empty, not absent
    logs = optional_table(spark, str(tmp_path), "acme", "default", "logs")
    assert logs is not None and logs.count() == 0
    assert "body" in logs.columns and "timestamp" in logs.columns


def test_tenant_schemas_route(tmp_path):
    api = AdminAPI(str(tmp_path))
    api.create_tenant("acme", "Acme")
    out = api.list_tenant_schemas("acme")
    assert out["status"] == "success"
    schemas = {s["table"]: s for s in out["data"]["schemas"]}
    assert "traces" in schemas and schemas["traces"]["current"] in schemas["traces"]["versions"]
    forbidden = api.list_tenant_schemas("acme", ctx_tenant_id="other")
    assert forbidden["errorType"] == "forbidden"


def test_create_tables_skips_legacy_layout(spark, tmp_path):
    """An existing legacy directory-layout table (real parquet, no
    manifest) must be SKIPPED — committing an empty manifest over it
    would shadow every file, since readers prefer the manifest
    snapshot."""
    import os

    from signaldb_spark.catalog import optional_table, signal_table_path

    api = AdminAPI(str(tmp_path))
    api.create_tenant("acme", "Acme")
    legacy = signal_table_path(str(tmp_path), "acme", "default", "logs")
    os.makedirs(legacy)
    spark.createDataFrame(
        [("2024-01-01 00:00:00", "api", "hello")],
        "timestamp string, service_name string, body string",
    ).write.parquet(legacy, mode="overwrite")

    out = api.create_tenant_tables("acme")
    assert "logs" in out["data"]["skipped"]
    assert "logs" not in out["data"]["created"]
    logs = optional_table(spark, str(tmp_path), "acme", "default", "logs")
    assert logs.count() == 1  # pre-existing data still visible


def test_tenant_tables_resolve_default_dataset(spark, tmp_path):
    """A tenant provisioned with default_dataset='prod' gets its tables
    under prod — not a stray 'default' directory; naming a dataset the
    tenant doesn't have is not_found."""
    import os

    api = AdminAPI(str(tmp_path))
    api.catalog.create_tenant("acme", "Acme", default_dataset="prod")
    out = api.create_tenant_tables("acme")
    assert out["status"] == "success" and out["data"]["created"]
    assert os.path.isdir(os.path.join(str(tmp_path), "acme", "prod", "logs"))
    assert not os.path.isdir(os.path.join(str(tmp_path), "acme", "default"))
    listed = api.list_tenant_tables("acme")["data"]["tables"]
    assert any(t["name"] == "logs" for t in listed)
    bad = api.list_tenant_tables("acme", dataset="staging")
    assert bad["status"] == "error" and bad["errorType"] == "not_found"


def test_create_tables_covers_exp_histogram_and_summary(spark, tmp_path):
    """The default set must include every table the engine queries —
    metrics_exponential_histogram feeds exphist_quantile and the rule
    context; a provisioned tenant must not get not_found there."""
    from signaldb_spark.catalog import optional_table

    api = AdminAPI(str(tmp_path))
    api.create_tenant("acme", "Acme")
    created = api.create_tenant_tables("acme")["data"]["created"]
    assert "metrics_exponential_histogram" in created
    assert "metrics_summary" in created
    eh = optional_table(spark, str(tmp_path), "acme", "default",
                        "metrics_exponential_histogram")
    assert eh is not None and eh.count() == 0
    assert "positive_bucket_counts" in eh.columns


def test_api_key_and_dataset_quotas(tmp_path):
    """429 quota_exceeded semantics (endpoints/admin.rs:529,797):
    ACTIVE keys only count (revoking frees quota); datasets likewise."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    cat.set_tenant_limits("t", max_api_keys=2, max_datasets=2)

    k1 = cat.create_api_key("t", key="sk_1", now=NOW)
    cat.create_api_key("t", key="sk_2", now=NOW)
    with pytest.raises(AdminError, match="active API keys") as e:
        cat.create_api_key("t", key="sk_3", now=NOW)
    assert e.value.code == "quota_exceeded"
    # revoking a key frees quota: creation succeeds again
    cat.revoke_api_key("t", k1["id"], now=NOW)
    cat.create_api_key("t", key="sk_3", now=NOW)

    # default dataset counts; limit 2 allows ONE more
    cat.create_dataset("t", "staging", now=NOW)
    with pytest.raises(AdminError, match="delete a dataset") as e2:
        cat.create_dataset("t", "third", now=NOW)
    assert e2.value.code == "quota_exceeded"
    with pytest.raises(AdminError, match="unknown limits"):
        cat.set_tenant_limits("t", max_cookies=1)


def test_storage_quota_tracker(spark, tmp_path):
    """storage_usage.rs semantics: usage from CURRENT snapshots only;
    unknown usage never blocks (accounting lag); at-or-over rejects with
    the reference's quota_exceeded message; other tenants isolated."""
    from signaldb_spark.storage.quota import (
        StorageQuotaExceeded,
        StorageUsageTracker,
        compute_usage,
    )

    api = AdminAPI(str(tmp_path))
    api.create_tenant("quota-tenant", "Q")
    api.create_tenant("other", "O")
    api.create_tenant_tables("quota-tenant")

    tracker = StorageUsageTracker(overrides={"quota-tenant": 1})
    assert tracker.quotas_configured()
    # usage not computed yet: ingest passes even with a 1-byte quota
    tracker.check_ingest("quota-tenant")

    # write real bytes, refresh, and the tenant is over its 1-byte quota
    from signaldb_spark.catalog import signal_table_path
    from signaldb_spark.storage import write_batch_manifest

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "api", "x" * 100)],
        "timestamp string, service_name string, body string",
    ).selectExpr("CAST(timestamp AS TIMESTAMP) timestamp", "service_name",
                 "body", "CAST(timestamp AS DATE) date_day",
                 "hour(timestamp) hour")
    path = signal_table_path(str(tmp_path), "quota-tenant", "default", "logs")
    write_batch_manifest(df, path, "logs", batch_id=1)

    usage = tracker.refresh(str(tmp_path))
    # "other" has no table directories yet — no usage entry (the
    # storage_usage route backfills catalog-known tenants with 0)
    assert usage["quota-tenant"] > 1 and usage.get("other", 0) == 0
    with pytest.raises(StorageQuotaExceeded, match="quota_exceeded"):
        tracker.check_ingest("quota-tenant")
    tracker.check_ingest("other")  # isolation: no quota, unaffected

    # monotonic accounting: another write grows usage
    before = usage["quota-tenant"]
    write_batch_manifest(df, path, "logs", batch_id=2)
    assert compute_usage(str(tmp_path))["quota-tenant"] > before


def test_storage_usage_route_and_limits_roundtrip(spark, tmp_path):
    api = AdminAPI(str(tmp_path))
    api.create_tenant("acme", "A")
    out = api.set_tenant_limits("acme", max_storage_bytes=10)
    assert out["status"] == "success"
    assert api.get_tenant_limits("acme")["data"] == {"max_storage_bytes": 10}
    report = api.storage_usage()
    row = next(r for r in report["data"] if r["tenant_id"] == "acme")
    assert row["max_storage_bytes"] == 10 and row["over_quota"] is False
    missing = api.get_tenant_limits("nope")
    assert missing["errorType"] == "not_found"


def test_user_creation_validation_and_single_commit(tmp_path):
    """admin.rs create_user: empty email / <12-char password / unknown
    role are validation errors, the tenant must exist, a duplicate
    email conflicts — and user + initial membership land in ONE catalog
    version (the reference's two catalog calls can strand a user with
    no membership on a crash between them; the versioned commit can't)."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("acme", "Acme", now=NOW)
    v_before = cat.versions()[-1]
    with pytest.raises(AdminError, match="email must not be empty"):
        cat.create_user("  ", "longpassword123", "acme")
    with pytest.raises(AdminError, match="at least 12 characters"):
        cat.create_user("a@x.io", "short", "acme")
    with pytest.raises(AdminError, match="expected admin, member, or viewer"):
        cat.create_user("a@x.io", "longpassword123", "acme", role="owner")
    with pytest.raises(AdminError, match="not found"):
        cat.create_user("a@x.io", "longpassword123", "ghost")
    u = cat.create_user("a@x.io", "longpassword123", "acme", role="admin",
                        now=NOW)
    assert cat.versions()[-1] == v_before + 1
    assert cat.list_memberships("acme") == [
        {"user_id": u["id"], "email": "a@x.io", "role": "admin"}]
    with pytest.raises(AdminError, match="already exists"):
        cat.create_user("a@x.io", "longpassword123", "acme")
    # only a salted KDF hash is on disk — never the plaintext
    raw = "".join(
        open(p).read() for p in glob.glob(str(tmp_path / "_catalog" / "*.json")))
    assert "longpassword123" not in raw


def test_last_admin_demotion_and_removal_guards(tmp_path):
    """management.rs: the last tenant administrator can be neither
    demoted (upsert to a non-admin role) nor removed; adding a second
    admin unlocks both. Self-removal is always a validation error."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    u1 = cat.create_user("one@x.io", "longpassword123", "t", role="admin")
    with pytest.raises(AdminError, match="cannot be demoted"):
        cat.upsert_membership("t", "one@x.io", "viewer")
    with pytest.raises(AdminError, match="cannot be removed"):
        cat.remove_membership("t", u1["id"])
    with pytest.raises(AdminError, match="your own active membership"):
        cat.remove_membership("t", u1["id"], actor_user_id=u1["id"])
    cat.create_user("two@x.io", "longpassword123", "t", role="admin")
    demoted = cat.upsert_membership("t", "one@x.io", "viewer")
    assert demoted["role"] == "viewer"
    cat.remove_membership("t", u1["id"])
    assert [m["email"] for m in cat.list_memberships("t")] == ["two@x.io"]
    # removing an absent membership is a no-op success (reference 204s)
    cat.remove_membership("t", u1["id"])


def test_membership_upsert_requires_active_user(tmp_path):
    """management.rs upsert_membership: lookup is by email and must
    find an ACTIVE (not disabled) user — both misses read as the same
    not_found."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    with pytest.raises(AdminError, match="Active user not found"):
        cat.upsert_membership("t", "ghost@x.io", "member")
    u = cat.create_user("u@x.io", "longpassword123", "t", role="admin")
    cat.create_user("v@x.io", "longpassword123", "t", role="admin")
    cat.disable_user(u["id"], now=NOW)
    with pytest.raises(AdminError, match="Active user not found"):
        cat.upsert_membership("t", "u@x.io", "member")


def test_session_tenant_resolution(tmp_path):
    """session.rs create_session: bad password and disabled user are
    indistinguishable; sole membership auto-selects; multiple
    memberships defer (tenant None) while still carrying the list; an
    explicit tenant must be a membership unless instance admin; zero
    memberships is forbidden."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("a", "A", now=NOW)
    cat.create_tenant("b", "B", now=NOW)
    u = cat.create_user("u@x.io", "longpassword123", "a", role="member")
    assert cat.create_session("u@x.io", "longpassword123")["tenant"] == "a"
    with pytest.raises(AdminError, match="Invalid email or password"):
        cat.create_session("u@x.io", "wrong-password!!")
    with pytest.raises(AdminError, match="Invalid email or password"):
        cat.create_session("ghost@x.io", "longpassword123")
    with pytest.raises(AdminError, match="not a member"):
        cat.create_session("u@x.io", "longpassword123", tenant="b")
    cat.upsert_membership("b", "u@x.io", "viewer")
    s = cat.create_session("u@x.io", "longpassword123")
    assert s["tenant"] is None and [m["tenant_id"] for m in s["memberships"]] == ["a", "b"]
    assert cat.create_session(
        "u@x.io", "longpassword123", tenant="b")["tenant"] == "b"
    root = cat.create_user("root@x.io", "longpassword123", "a",
                           instance_admin=True)
    assert cat.create_session(
        "root@x.io", "longpassword123", tenant="b")["tenant"] == "b"
    cat.disable_user(root["id"], now=NOW)
    with pytest.raises(AdminError, match="Invalid email or password"):
        cat.create_session("root@x.io", "longpassword123")


def test_admin_api_user_membership_routes(tmp_path):
    """AdminAPI envelopes for the user/membership/session routes: data
    on success, the reference's error codes on failure, and no
    password material in any envelope."""
    api = AdminAPI(str(tmp_path))
    api.create_tenant("t", "T")
    out = api.create_user("u@x.io", "longpassword123", "t", role="admin")
    assert out["status"] == "success"
    assert "password" not in json.dumps(out)
    assert api.create_user("u@x.io", "longpassword123", "t")[
        "errorType"] == "conflict"
    assert api.create_user("v@x.io", "short", "t")[
        "errorType"] == "validation_error"
    ms = api.list_memberships("t")
    assert ms["status"] == "success" and ms["data"][0]["role"] == "admin"
    assert api.list_memberships("ghost")["errorType"] == "not_found"
    assert api.upsert_membership("t", "u@x.io", "viewer")[
        "errorType"] == "conflict"  # last-admin demotion
    s = api.create_session("u@x.io", "longpassword123")
    assert s["status"] == "success" and s["data"]["tenant"] == "t"
    assert api.create_session("u@x.io", "nope-nope-nope")[
        "errorType"] == "unauthorized"
    uid = out["data"]["id"]
    assert api.remove_membership("t", uid, actor_user_id=uid)[
        "errorType"] == "validation_error"


def test_email_canonicalization_is_case_insensitive(tmp_path):
    """ADR users-tenant-membership: email is trimmed + lowercased at
    creation AND at every lookup; uniqueness applies to the canonical
    form, so 'User@X.io' and 'user@x.io' are the same identity at
    create, membership upsert, and login."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    u = cat.create_user("  User@X.io ", "longpassword123", "t", role="admin")
    assert u["email"] == "user@x.io"
    with pytest.raises(AdminError, match="already exists"):
        cat.create_user("USER@x.IO", "longpassword123", "t")
    assert cat.get_user_by_email(" USER@X.io")["id"] == u["id"]
    s = cat.create_session("User@X.IO ", "longpassword123")
    assert s["user_id"] == u["id"]
    cat.create_user("two@x.io", "longpassword123", "t", role="admin")
    assert cat.upsert_membership("t", "USER@X.io", "viewer")["role"] == "viewer"


def test_session_tokens_hash_only_expiry_and_revocation(tmp_path):
    """ADR session contract: a fresh opaque token per login, only its
    SHA-256 in the catalog, bounded absolute lifetime, server-side
    logout, and disabled-user cutoff at the next validation."""
    cat = TenantCatalog(str(tmp_path))
    cat.create_tenant("t", "T", now=NOW)
    u = cat.create_user("u@x.io", "longpassword123", "t", role="member")
    s1 = cat.create_session("u@x.io", "longpassword123", now=NOW)
    s2 = cat.create_session("u@x.io", "longpassword123", now=NOW)
    assert s1["token"] != s2["token"]  # fresh token every login
    raw = "".join(
        open(p).read() for p in glob.glob(str(tmp_path / "_catalog" / "*.json")))
    assert s1["token"] not in raw and s2["token"] not in raw
    who = cat.validate_session(s1["token"], now=NOW)
    assert who["user_id"] == u["id"]
    assert who["memberships"] == [{"tenant_id": "t", "role": "member"}]
    # expiry: 12h default lifetime, checked against the supplied clock
    assert cat.validate_session(
        s1["token"], now="2024-01-01T11:00:00+00:00") is not None
    assert cat.validate_session(
        s1["token"], now="2024-01-02T00:00:00+00:00") is None
    # unknown and revoked tokens read identically
    assert cat.validate_session("sess_bogus", now=NOW) is None
    cat.revoke_session(s1["token"], now=NOW)
    assert cat.validate_session(s1["token"], now=NOW) is None
    cat.revoke_session(s1["token"], now=NOW)  # no-op, no error
    # disabling the user kills the OTHER live session without touching it
    assert cat.validate_session(s2["token"], now=NOW) is not None
    cat.disable_user(u["id"], now=NOW)
    assert cat.validate_session(s2["token"], now=NOW) is None


def test_whoami_and_logout_routes(tmp_path):
    api = AdminAPI(str(tmp_path))
    api.create_tenant("a", "A")
    api.create_tenant("b", "B")
    api.create_user("u@x.io", "longpassword123", "a", role="admin")
    api.upsert_membership("b", "u@x.io", "viewer")
    tok = api.create_session("u@x.io", "longpassword123")["data"]["token"]
    who = api.whoami(tok)
    assert who["status"] == "success"
    assert [m["tenant_id"] for m in who["data"]["memberships"]] == ["a", "b"]
    assert api.logout(tok)["status"] == "success"
    assert api.whoami(tok)["errorType"] == "unauthorized"
