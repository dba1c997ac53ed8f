"""Query security + the user/group/ACL model (operators A22, A28).

The reference EXPLAINs every user query and walks the Postgres plan
tree, denying writes, unknown relations, plan nodes it cannot classify,
and datasets the user cannot read
(`src/backend/src/Lagoon/Verified.hs:795-854`,
`src/backend/src/Lagoon/Util/PostgreSQL/QueryPlan.hs:144-178,316-375`).

The Spark-idiomatic analog walks the *parsed logical plan*: Catalyst's
``LogicalPlan.toJSON`` flattens the operator tree, each node carrying
its class name. We:

* allow-list logical operator classes (fail **closed** on anything
  unknown — the reference throws on unknown plan nodes,
  QueryPlan.hs:339);
* reject any command/write node (the reference: ModifyTable ⇒ "Write …
  not allowed", Verified.hs:807-808);
* reject table-valued functions (FunctionScan in a user query aborts
  the security summary — "Query plan contains functions",
  QueryPlan.hs:338-340);
* collect every ``UnresolvedRelation`` and check per-dataset read ACL
  (CTE names introduced by WITH are allowed like Postgres CTEScans).

ACL model (`DB/Schema.hs:339-493`, `Lagoon/DB/Security.hs`): users,
groups, group membership, per-dataset grants at levels
Read < Update < Manage, a public flag, and a default-deny check that
passes when the dataset is public or the user (directly or via a
group) holds ≥ the required level.
"""

from __future__ import annotations

import json
import re
import weakref

import pandas as pd

# the only string-serialized function identifier shape we accept:
# "[simple_name]" with no quoting, commas, or nested brackets
_SIMPLE_FN_IDENT = re.compile(r"^\[([A-Za-z_][A-Za-z0-9_]*)\]$")

# relations may be multi-part ([db, table]) and view names may carry
# unicode (sanitize keeps it), but each part must be quote/bracket/
# comma/space-free so the comma split cannot mis-tokenize
_SIMPLE_REL_IDENT = re.compile(
    r"^\[([^\s,\[\]`'\"]+(?:,\s*[^\s,\[\]`'\"]+)*)\]$"
)

LEVELS = {"read": 1, "update": 2, "manage": 3}  # DB/Schema.hs:83-93

# Logical operator classes a read-only SELECT can produce (the Spark
# analog of the reference's NodeType list, QueryPlan.hs:144-178)
_ALLOWED_SUFFIXES = {
    "UnresolvedRelation",
    "Project",
    "Filter",
    "Join",
    "Aggregate",
    "Sort",
    "GlobalLimit",
    "LocalLimit",
    "Offset",
    "Distinct",
    "Deduplicate",
    "Union",
    "Intersect",
    "Except",
    "SubqueryAlias",
    "UnresolvedSubqueryColumnAliases",
    "UnresolvedWith",
    "With",
    "CTERelationDef",
    "CTERelationRef",
    "UnresolvedHaving",
    "Window",
    "Expand",
    "UnresolvedInlineTable",  # VALUES scan (QueryPlan.hs ValuesScan)
    "OneRowRelation",
    "GroupingSets",
    "Pivot",
    "Unpivot",
    "LateralSubquery",
    "ScalarSubquery",
    "Exists",
    "ListQuery",
    "InSubquery",
    "WithWindowDefinition",
    "UnresolvedTVFAliases",
    "Range",
}

_DENIED_HINTS = ("Command", "Insert", "Write", "Delete", "Update", "Merge", "Create", "Drop", "Alter")

# Scalar functions with JVM-escape power. The reference delegates
# scalar-function privilege checks to Postgres; Spark has no such
# layer, so the analog screens them here: these are denied outright,
# and any function NOT in the session's function registry is denied
# fail-closed (matching QueryPlan.hs:339's unknown-node behavior).
# Name aliases drift across Spark versions (try_reflect appeared in
# 3.5), so the resolved expression class is screened too.
_DENIED_FUNCTIONS = {"reflect", "java_method", "try_reflect"}

# Any registry entry resolving to a reflection-capable expression is a
# JVM escape regardless of what name it was registered under
# (CallMethodViaReflection backs reflect/java_method; TryReflect is the
# TRY-semantics wrapper).
_DENIED_CLASS_MARKERS = ("reflect",)

_session_fn_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_session_fn_class_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _session_functions(spark) -> frozenset[str]:
    """Registered function names for this session (builtins + engine
    UDFs), cached per SparkSession (weakly — the cache entry dies with
    the session, so a recycled id() can never inherit a dead session's
    function set)."""
    cached = _session_fn_cache.get(spark)
    if cached is None:
        rows = spark.sql("SHOW FUNCTIONS").collect()
        cached = frozenset(str(r[0]).lower() for r in rows)
        _session_fn_cache[spark] = cached
    return cached


def _function_class(spark, fn: str) -> str:
    """Resolved implementation class for a registered function name
    (empty string when the catalog cannot resolve it — callers treat
    that as unscreenable and rely on the name checks)."""
    cache = _session_fn_class_cache.get(spark)
    if cache is None:
        cache = {}
        _session_fn_class_cache[spark] = cache
    if fn not in cache:
        try:
            cache[fn] = str(spark.catalog.getFunction(fn).className or "")
        except Exception:
            cache[fn] = ""
    return cache[fn]


class QueryDenied(Exception):
    pass


def _parse_plan_json(spark, sql: str) -> list[dict]:
    parser = spark._jsparkSession.sessionState().sqlParser()
    try:
        plan = parser.parsePlan(sql)
    except Exception as e:  # parse error → 400, like the reference
        raise QueryDenied(f"SQL parse error: {e}") from None
    return json.loads(plan.toJSON())


def _walk(
    nodes: list[dict],
    relations: set[str],
    cte_names: set[str],
    functions: set[str] | None = None,
) -> None:
    if functions is None:
        functions = set()
    for node in nodes:
        cls = node.get("class", "")
        simple = cls.rsplit(".", 1)[-1]
        if any(h in simple for h in _DENIED_HINTS):
            raise QueryDenied(f"Write/DDL not allowed: {simple}")
        if "TableValuedFunction" in simple or simple == "UnresolvedGenerator":
            # reference: "Query plan contains functions"
            raise QueryDenied("Query plan contains functions")
        if simple == "UnresolvedFunction":
            ident = node.get("nameParts")
            if isinstance(ident, list):
                parts = [str(p) for p in ident]
            elif isinstance(ident, str):
                # Spark serializes Seq[String] as the literal "[name]".
                # Only the trivially-safe single-identifier shape is
                # accepted; anything with commas/backticks/brackets
                # inside is NOT tokenized (mis-splitting risk) — denied
                # with an explicit message instead
                m = _SIMPLE_FN_IDENT.match(ident)
                if not m:
                    raise QueryDenied(
                        "Unparseable function identifier (fail closed)"
                    )
                parts = [m.group(1)]
            else:
                parts = []
            if len(parts) != 1:
                # qualified (db.fn) functions can't be safe builtins
                raise QueryDenied(f"Qualified function not allowed: {'.'.join(parts)}")
            functions.add(parts[0].lower())
        if simple in ("UnresolvedWith", "With"):
            # cteRelations: [Tuple2/3 of (name, plan, ...)]
            for item in node.get("cteRelations", []) or []:
                if isinstance(item, dict) and "_1" in item:
                    cte_names.add(str(item["_1"]).lower())
        if simple == "UnresolvedRelation":
            ident = node.get("multipartIdentifier")
            if isinstance(ident, list):
                parts = [str(p) for p in ident]
            elif isinstance(ident, str):
                # same safe-shape rule as function identifiers: plain
                # [a] / [a, b] only — backtick-quoted names with commas
                # or brackets inside are not tokenized (they would
                # mis-split); deny explicitly instead
                m = _SIMPLE_REL_IDENT.match(ident)
                if not m:
                    raise QueryDenied(
                        "Unparseable relation identifier (fail closed)"
                    )
                parts = [p.strip() for p in m.group(1).split(",")]
            else:
                raise QueryDenied("Unparseable relation identifier (fail closed)")
            relations.add(parts[-1].lower())
            continue
        # the operator allowlist applies to logical-plan operators; the
        # flattened JSON also inlines expression/analysis helper nodes
        # (UnresolvedAttribute, aliases, literals, ...) which carry no
        # relational power of their own — they only matter through the
        # operators above them, so they pass the list but still get the
        # denied-hint / TVF screening and relation collection
        if ".plans.logical." in cls and simple not in _ALLOWED_SUFFIXES:
            raise QueryDenied(f"Unrecognized plan node (fail closed): {simple}")
        # nested plans (subqueries, CTE definitions) hide in field values
        for v in node.values():
            _walk_nested(v, relations, cte_names, functions)


def _walk_nested(v, relations, cte_names, functions=None) -> None:
    if isinstance(v, list):
        if v and isinstance(v[0], dict) and "class" in v[0]:
            _walk(v, relations, cte_names, functions)
        else:
            for item in v:
                _walk_nested(item, relations, cte_names, functions)
    elif isinstance(v, dict):
        if "class" in v:
            _walk([v], relations, cte_names, functions)
        else:
            for item in v.values():
                _walk_nested(item, relations, cte_names, functions)


# --- ACL storage on top of the Catalog ----------------------------------

_SEC_TABLES = {
    "groups": {"ix": "int64", "name": "object"},
    "group_members": {"group_ix": "int64", "user": "object"},
    "group_managers": {"group_ix": "int64", "user": "object"},
    # ACL rows anchor on the DATASET (sourcename_ix), not a version ix:
    # the reference's CanReadDataset is keyed on sourceNameIx
    # (`src/backend/src/Lagoon/DB/SourceInfo.hs`), so one revoke or
    # un-publish covers every version — a caller must never have to
    # walk versions to make a dataset private (round-3 advisory).
    "grants": {"sourcename_ix": "int64", "subject_type": "object", "subject": "object", "level": "object"},
    "public_sources": {"sourcename_ix": "int64", "level": "object"},
    "user_caps": {"user": "object", "capability": "object", "allowed": "bool"},
}

# Explicit no-enforcement principal for grant/revoke and the group
# mutators: internal engine plumbing that has already authorized the
# operation passes SYSTEM; forgetting to thread an actor is an error,
# not a silent bypass (round-3 advisory: the mutators failed open).


class _System:
    def __repr__(self) -> str:  # pragma: no cover
        return "security.SYSTEM"


SYSTEM = _System()


def _check_actor(actor) -> None:
    if actor is None:
        raise ValueError(
            "an actor is required; pass security.SYSTEM to bypass "
            "enforcement deliberately"
        )

# the administrator principal (the reference authenticates an admin via
# the DB admin password, `runsecuritytests.sh:75`; the library analog is
# a distinguished username every check passes)
ADMIN = "admin"

# global capabilities (`DB/Schema.hs` users table flags): granted by
# default, explicitly revocable — CREATEGROUP gates create_group,
# CREATE gates ingesting a *new* dataset name
CAPABILITIES = {"create", "creategroup"}


def _sec_load(catalog, table: str) -> pd.DataFrame:
    import os

    p = os.path.join(catalog.dir, f"{table}.parquet")
    if os.path.exists(p):
        return pd.read_parquet(p)
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _SEC_TABLES[table].items()})


def _sec_save(catalog, table: str, df: pd.DataFrame) -> None:
    import os

    os.makedirs(catalog.dir, exist_ok=True)
    df.reset_index(drop=True).to_parquet(
        os.path.join(catalog.dir, f"{table}.parquet"), index=False
    )


class PermissionDenied(Exception):
    pass


def is_admin(user: str | None) -> bool:
    return user == ADMIN


def set_capability(catalog, user: str, capability: str, allowed: bool) -> None:
    """Grant/revoke a global capability (admin operation — the library
    analog of `manage-user --grant/--revoke`)."""
    if capability not in CAPABILITIES:
        raise ValueError(capability)
    caps = _sec_load(catalog, "user_caps")
    caps = caps[~((caps["user"] == user) & (caps["capability"] == capability))]
    _sec_save(catalog, "user_caps", pd.concat([caps, pd.DataFrame([{
        "user": user, "capability": capability, "allowed": allowed,
    }])], ignore_index=True))


def has_capability(catalog, user: str, capability: str) -> bool:
    """Capabilities default to granted (`runsecuritytests.sh`: 'users
    can create groups/datasets by default'), explicit revocation wins."""
    if is_admin(user):
        return True
    caps = _sec_load(catalog, "user_caps")
    hit = caps[(caps["user"] == user) & (caps["capability"] == capability)]
    if len(hit):
        return bool(hit.iloc[0]["allowed"])
    return True


def _group_ix(catalog, name: str) -> int | None:
    g = _sec_load(catalog, "groups")
    hit = g[g["name"] == name]
    return int(hit.iloc[0]["ix"]) if len(hit) else None


def create_group(catalog, name: str, actor=None) -> int:
    """Create a group; the creator becomes its manager. The CREATEGROUP
    capability is enforced unless ``actor`` is :data:`SYSTEM`."""
    _check_actor(actor)
    if actor is not SYSTEM and not has_capability(catalog, actor, "creategroup"):
        raise PermissionDenied(f"{actor!r} may not create groups")
    existing = _group_ix(catalog, name)
    if existing is not None:
        return existing
    g = _sec_load(catalog, "groups")
    ix = int(g["ix"].max()) + 1 if len(g) else 1
    _sec_save(catalog, "groups", pd.concat([g, pd.DataFrame([{"ix": ix, "name": name}])], ignore_index=True))
    if actor is not SYSTEM and not is_admin(actor):
        mg = _sec_load(catalog, "group_managers")
        _sec_save(catalog, "group_managers", pd.concat([mg, pd.DataFrame([{
            "group_ix": ix, "user": actor,
        }])], ignore_index=True))
    return ix


def is_group_manager(catalog, group: str, user: str) -> bool:
    if is_admin(user):
        return True
    gix = _group_ix(catalog, group)
    if gix is None:
        return False
    mg = _sec_load(catalog, "group_managers")
    return bool(len(mg[(mg["group_ix"] == gix) & (mg["user"] == user)]))


def set_group_manager(catalog, group: str, user: str, manager: bool, actor=None) -> None:
    """Grant/revoke manage rights on a group (managers and the admin
    can do this — 'admins can give other people admin rights')."""
    _check_actor(actor)
    if actor is not SYSTEM and not is_group_manager(catalog, group, actor):
        raise PermissionDenied(f"{actor!r} does not manage group {group!r}")
    gix = create_group(catalog, group, actor=SYSTEM)
    mg = _sec_load(catalog, "group_managers")
    mg = mg[~((mg["group_ix"] == gix) & (mg["user"] == user))]
    if manager:
        mg = pd.concat([mg, pd.DataFrame([{"group_ix": gix, "user": user}])], ignore_index=True)
    _sec_save(catalog, "group_managers", mg)


def add_to_group(catalog, group: str, user: str, actor=None) -> None:
    """Only group managers (or admin, or SYSTEM) may add members —
    'group membership does not imply manage rights'."""
    _check_actor(actor)
    if actor is not SYSTEM and not is_group_manager(catalog, group, actor):
        raise PermissionDenied(f"{actor!r} does not manage group {group!r}")
    gix = create_group(catalog, group, actor=SYSTEM)
    m = _sec_load(catalog, "group_members")
    if not len(m[(m["group_ix"] == gix) & (m["user"] == user)]):
        _sec_save(catalog, "group_members", pd.concat([m, pd.DataFrame([{"group_ix": gix, "user": user}])], ignore_index=True))


def remove_from_group(catalog, group: str, user: str, actor=None) -> None:
    _check_actor(actor)
    if actor is not SYSTEM and not is_group_manager(catalog, group, actor):
        raise PermissionDenied(f"{actor!r} does not manage group {group!r}")
    gix = create_group(catalog, group, actor=SYSTEM)
    m = _sec_load(catalog, "group_members")
    _sec_save(catalog, "group_members", m[~((m["group_ix"] == gix) & (m["user"] == user))])


def group_members(catalog, group: str) -> list[str]:
    gix = _group_ix(catalog, group)
    if gix is None:
        return []
    m = _sec_load(catalog, "group_members")
    return sorted(m[m["group_ix"] == gix]["user"].tolist())


def _can_administer(catalog, actor, source_ix: int, owner: str | None) -> bool:
    return (
        actor is SYSTEM
        or is_admin(actor)
        or (owner is not None and actor == owner)
        or user_level(catalog, actor, source_ix) >= LEVELS["manage"]
    )


def grant(
    catalog,
    source_ix: int,
    subject: str,
    level: str,
    actor=None,
    subject_type: str = "user",
    owner: str | None = None,
) -> None:
    """Grant ``subject`` an access level on the DATASET owning
    ``source_ix`` (anchored on the sourcename — covers every version).
    Only admin, the dataset owner, manage-level holders, or
    :data:`SYSTEM` may grant."""
    _check_actor(actor)
    if level not in LEVELS:
        raise ValueError(level)
    if not _can_administer(catalog, actor, source_ix, owner):
        raise PermissionDenied(f"{actor!r} may not grant on dataset {source_ix}")
    anchor = _anchor_ix(catalog, source_ix)
    g = _sec_load(catalog, "grants")
    g = g[~((g["sourcename_ix"] == anchor) & (g["subject_type"] == subject_type) & (g["subject"] == subject))]
    _sec_save(catalog, "grants", pd.concat([g, pd.DataFrame([{
        "sourcename_ix": anchor, "subject_type": subject_type, "subject": subject, "level": level,
    }])], ignore_index=True))


def revoke(catalog, source_ix: int, subject: str, actor=None, subject_type: str = "user", owner: str | None = None) -> None:
    """Remove ``subject``'s grant on the dataset owning ``source_ix``.
    Dataset-anchored: one call revokes across all versions."""
    _check_actor(actor)
    if not _can_administer(catalog, actor, source_ix, owner):
        raise PermissionDenied(f"{actor!r} may not revoke on dataset {source_ix}")
    anchor = _anchor_ix(catalog, source_ix)
    g = _sec_load(catalog, "grants")
    _sec_save(catalog, "grants", g[~((g["sourcename_ix"] == anchor) & (g["subject_type"] == subject_type) & (g["subject"] == subject))])


def set_public(
    catalog,
    source_ix: int,
    public: bool = True,
    level: str = "read",
    actor=None,
    owner: str | None = None,
) -> None:
    """Mark the DATASET owning ``source_ix`` public at an access level
    (the reference supports a custom public access level,
    `runsecuritytests.sh` 'CUSTOM PUBLIC ACCESS LEVEL'). Anchored on
    the sourcename: publishing any version publishes the dataset, and
    one ``set_public(ix, False)`` makes it private again regardless of
    which versions were published. Unless ``actor`` is SYSTEM, manage
    rights are enforced ('public does not give admin rights')."""
    _check_actor(actor)
    if level not in LEVELS:
        raise ValueError(level)
    if not _can_administer(catalog, actor, source_ix, owner):
        raise PermissionDenied(f"{actor!r} may not change visibility of {source_ix}")
    anchor = _anchor_ix(catalog, source_ix)
    p = _sec_load(catalog, "public_sources")
    p = p[p["sourcename_ix"] != anchor]
    if public:
        p = pd.concat(
            [p, pd.DataFrame([{"sourcename_ix": anchor, "level": level}])],
            ignore_index=True,
        )
    _sec_save(catalog, "public_sources", p)


def _anchor_ix(catalog, source_ix: int) -> int:
    """The dataset anchor (sourcename_ix) owning a version ix; a
    version unknown to the catalog anchors on itself (synthetic test
    fixtures)."""
    sources = catalog.load("sources")
    row = sources[sources["ix"] == source_ix]
    if not len(row):
        return int(source_ix)
    return int(row.iloc[0]["sourcename_ix"])


def _sibling_ixes(catalog, source_ix: int) -> list[int]:
    """All version ixes of the dataset that owns ``source_ix``."""
    sources = catalog.load("sources")
    row = sources[sources["ix"] == source_ix]
    if not len(row):
        return [source_ix]
    sn = row.iloc[0]["sourcename_ix"]
    return [int(x) for x in sources[sources["sourcename_ix"] == sn]["ix"]]


def _dataset_level(user: str, anchor_ix: int, tables) -> int:
    """Access level from grants/public rows anchored on the dataset.
    ``tables`` = (public_sources, grants, my_group_names) loaded once
    by the caller."""
    pub, g, my_groups = tables
    mine_pub = pub[pub["sourcename_ix"] == anchor_ix]
    level = 0
    if len(mine_pub):
        raw = mine_pub.iloc[0].get("level")
        level = LEVELS.get(raw if isinstance(raw, str) else "read", 1)
    mine = g[g["sourcename_ix"] == anchor_ix]
    direct = mine[(mine["subject_type"] == "user") & (mine["subject"] == user)]
    for _, row in direct.iterrows():
        level = max(level, LEVELS[row["level"]])
    via_group = mine[(mine["subject_type"] == "group") & (mine["subject"].isin(my_groups))]
    for _, row in via_group.iterrows():
        level = max(level, LEVELS[row["level"]])
    return level


def _load_acl_tables(catalog, user: str):
    pub = _sec_load(catalog, "public_sources")
    g = _sec_load(catalog, "grants")
    members = _sec_load(catalog, "group_members")
    groups = _sec_load(catalog, "groups")
    my_groups = members[members["user"] == user].merge(
        groups, left_on="group_ix", right_on="ix"
    )["name"].tolist()
    return pub, g, my_groups


def user_level(catalog, user: str, source_ix: int) -> int:
    """Max access level for user on the DATASET owning ``source_ix``
    (0 = none): ACLs attach to the sourcename (the reference's
    CanReadDataset sourceNameIx), so one anchored lookup covers every
    version — the 'can-read cache' recomputed on demand."""
    tables = _load_acl_tables(catalog, user)
    return _dataset_level(user, _anchor_ix(catalog, source_ix), tables)


def dataset_public_level(catalog, source_ix: int) -> int:
    """User-independent public level of the dataset owning
    ``source_ix`` (0 = private)."""
    pub = _sec_load(catalog, "public_sources")
    anchor = _anchor_ix(catalog, source_ix)
    level = 0
    for _, row in pub[pub["sourcename_ix"] == anchor].iterrows():
        raw = row.get("level")
        level = max(level, LEVELS.get(raw if isinstance(raw, str) else "read", 1))
    return level


def can_read(catalog, user: str, source_ix: int) -> bool:
    return is_admin(user) or user_level(catalog, user, source_ix) >= LEVELS["read"]


def can_update(catalog, user: str, source_ix: int) -> bool:
    return is_admin(user) or user_level(catalog, user, source_ix) >= LEVELS["update"]


def can_manage(catalog, user: str, source_ix: int) -> bool:
    return is_admin(user) or user_level(catalog, user, source_ix) >= LEVELS["manage"]


# --- the verified query entry point --------------------------------------

METADATA_VIEWS = {"lagoon_sources", "lagoon_columns", "lagoon_tags"}


def verify_user_query(engine, sql: str, user: str) -> None:
    nodes = _parse_plan_json(engine.spark, sql)
    relations: set[str] = set()
    cte_names: set[str] = set()
    functions: set[str] = set()
    _walk(nodes, relations, cte_names, functions)

    registered = _session_functions(engine.spark)
    for fn in functions:
        if fn in _DENIED_FUNCTIONS:
            raise QueryDenied(f"Function not allowed: {fn}")
        if fn not in registered:
            raise QueryDenied(f"Unknown function (fail closed): {fn}")
        # name-independent screen: deny any registry entry whose
        # resolved expression class is reflection-backed, so future
        # aliases of reflect/java_method stay denied without a list edit
        cls = _function_class(engine.spark, fn).lower()
        if any(marker in cls for marker in _DENIED_CLASS_MARKERS):
            raise QueryDenied(f"Function not allowed (reflection): {fn}")

    sources = engine.catalog.load("sources")
    by_view: dict[str, int] = {}
    for _, row in sources.iterrows():
        by_view[str(row["view_name"]).lower()] = int(row["ix"])
        if pd.notna(row["typed_view_name"]):
            by_view[str(row["typed_view_name"]).lower()] = int(row["ix"])

    for rel in relations:
        if rel in cte_names or rel in METADATA_VIEWS:
            continue
        if rel not in by_view:
            raise QueryDenied(f"Unknown table: {rel}")
        ix = by_view[rel]
        if not can_read(engine.catalog, user, ix) and not _is_owner(engine, user, ix):
            raise QueryDenied(f"User {user!r} cannot read dataset {rel}")


def _is_owner(engine, user: str, source_ix: int) -> bool:
    info = engine.catalog.get_source_by_ix(source_ix)
    return info.added_by == user
