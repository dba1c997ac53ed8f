"""The reference's security integration scenario as a pytest.

Mirrors `clients/cmdline/test-cases/runsecuritytests.sh` section by
section: users Alice/Bob/Carol, groups AB/BC/AC, global capabilities
(CREATEGROUP / CREATE), group manage rights, public-vs-private
datasets with the leveled public default, and per-dataset custom
public access levels. The library analog of the admin password is the
distinguished ``admin`` principal.
"""

from __future__ import annotations

import pytest

from lagoon_spark import security as sec
from lagoon_spark.engine import Lagoon
from lagoon_spark.security import ADMIN, PermissionDenied, QueryDenied


@pytest.fixture()
def world(spark, tmp_path):
    """A shared warehouse with a public-by-default engine per user."""
    wh = str(tmp_path / "wh")
    engines = {
        u: Lagoon(spark, wh, user=u, default_public=True)
        for u in (ADMIN, "alice", "bob", "carol")
    }
    engines[ADMIN].init_db()
    # one shared catalog object so pandas caches stay coherent across
    # the per-user engine facades
    for e in engines.values():
        e.catalog = engines[ADMIN].catalog
    return engines


def _csv(tmp_path, name, text="a,b\n1,x\n2,y\n"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_group_capability_chain(world):
    """CREATING GROUPS (`runsecuritytests.sh:78-96`)."""
    cat = world[ADMIN].catalog
    # admin creates AB; Bob creates BC by default capability
    sec.create_group(cat, "AB", actor=ADMIN)
    sec.create_group(cat, "BC", actor="bob")
    # admin revokes CREATEGROUP for Carol -> she fails
    sec.set_capability(cat, "carol", "creategroup", False)
    with pytest.raises(PermissionDenied):
        sec.create_group(cat, "AC", actor="carol")
    # grant back -> she succeeds
    sec.set_capability(cat, "carol", "creategroup", True)
    sec.create_group(cat, "AC", actor="carol")
    assert sec.is_group_manager(cat, "BC", "bob")
    assert sec.is_group_manager(cat, "AC", "carol")


def test_group_management_rights(world):
    """GROUP MANAGEMENT (`runsecuritytests.sh:98-147`)."""
    cat = world[ADMIN].catalog
    sec.create_group(cat, "BC", actor="bob")
    # creator has manage rights: Bob adds himself, Carol, Alice; then
    # removes Alice again
    sec.add_to_group(cat, "BC", "bob", actor="bob")
    sec.add_to_group(cat, "BC", "carol", actor="bob")
    sec.add_to_group(cat, "BC", "alice", actor="bob")
    sec.remove_from_group(cat, "BC", "alice", actor="bob")
    assert sec.group_members(cat, "BC") == ["bob", "carol"]
    # membership does not imply manage rights: Carol cannot add Alice
    with pytest.raises(PermissionDenied):
        sec.add_to_group(cat, "BC", "alice", actor="carol")
    # admin has all rights on a group they did not create
    sec.add_to_group(cat, "BC", "alice", actor=ADMIN)
    sec.remove_from_group(cat, "BC", "alice", actor=ADMIN)
    # admin grants Alice manage rights -> she can add herself and Bob
    sec.set_group_manager(cat, "BC", "alice", True, actor=ADMIN)
    sec.add_to_group(cat, "BC", "alice", actor="alice")
    sec.add_to_group(cat, "BC", "bob", actor="alice")
    # revoked -> she cannot remove Bob anymore
    sec.set_group_manager(cat, "BC", "alice", False, actor=ADMIN)
    with pytest.raises(PermissionDenied):
        sec.remove_from_group(cat, "BC", "bob", actor="alice")
    # managers can mint other managers, and new managers can demote the
    # old ones ('admins can revoke other people's admin rights')
    sec.create_group(cat, "AC", actor="carol")
    sec.set_group_manager(cat, "AC", "alice", True, actor="carol")
    sec.set_group_manager(cat, "AC", "carol", False, actor="alice")
    sec.add_to_group(cat, "AC", "carol", actor="alice")
    with pytest.raises(PermissionDenied):
        sec.add_to_group(cat, "AC", "bob", actor="carol")


def test_dataset_create_capability(world, tmp_path):
    """CREATING DATASETS (`runsecuritytests.sh:149-175`)."""
    cat = world[ADMIN].catalog
    world[ADMIN].ingest(_csv(tmp_path, "admin.csv"), "admin_ds")
    world["alice"].ingest(_csv(tmp_path, "alice.csv"), "alice_ds")
    world["bob"].ingest(_csv(tmp_path, "bob.csv"), "bob_ds")
    sec.set_capability(cat, "carol", "create", False)
    with pytest.raises(PermissionDenied):
        world["carol"].ingest(_csv(tmp_path, "carol.csv"), "carol_ds")
    sec.set_capability(cat, "carol", "create", True)
    world["carol"].ingest(_csv(tmp_path, "carol.csv"), "carol_ds")


def test_public_vs_private_lifecycle(world, tmp_path):
    """PUBLIC VERSUS NON-PUBLIC (`runsecuritytests.sh:177-214`)."""
    cat = world[ADMIN].catalog
    info = world["bob"].ingest(_csv(tmp_path, "pub.csv"), "bobpub")
    # public by default: Alice can download AND upload a new version
    assert "".join(world["alice"].download(info)).startswith("a,b")
    v2 = world["alice"].ingest(_csv(tmp_path, "pub2.csv"), "bobpub")
    assert v2.version == 2
    # ...but public does not give admin rights
    with pytest.raises(PermissionDenied):
        sec.set_public(cat, info.ix, False, actor="alice", owner=info.added_by)
    # the uploader has admin rights: Bob makes it private — ONE call
    # suffices because ACLs anchor on the dataset, even though v2 was
    # published under its own version ix (round-3 advisory closed)
    sec.set_public(cat, info.ix, False, actor="bob", owner=info.added_by)
    assert sec.dataset_public_level(cat, v2.ix) == 0
    with pytest.raises(PermissionDenied):
        list(world["alice"].download(info))
    with pytest.raises(PermissionDenied):
        # the sibling version too (carol — alice uploaded v2 and keeps
        # owner rights on her own upload)
        list(world["carol"].download(v2))
    with pytest.raises(PermissionDenied):
        world["alice"].ingest(_csv(tmp_path, "pub3.csv"), "bobpub")
    with pytest.raises(PermissionDenied):
        sec.set_public(cat, info.ix, True, actor="alice", owner=info.added_by)
    # made public again -> Alice can download and update, still not manage
    sec.set_public(cat, info.ix, True, level="update", actor="bob", owner=info.added_by)
    assert "".join(world["alice"].download(info)).startswith("a,b")
    world["alice"].ingest(_csv(tmp_path, "pub4.csv"), "bobpub")
    with pytest.raises(PermissionDenied):
        sec.set_public(cat, info.ix, False, actor="alice", owner=info.added_by)


def test_private_on_ingest_override(world, tmp_path):
    """OVERRIDE DEFAULT (`runsecuritytests.sh:216-230`): explicit
    private ingest under a public-by-default engine."""
    info = world["bob"].ingest(
        _csv(tmp_path, "priv.csv"), "bobpriv", public=False
    )
    with pytest.raises(PermissionDenied):
        list(world["alice"].download(info))
    with pytest.raises(QueryDenied):
        world["alice"].sql("SELECT * FROM bobpriv_v1", user="alice")


def test_custom_public_access_level(world, tmp_path):
    """CUSTOM PUBLIC ACCESS LEVEL (`runsecuritytests.sh:232-`):
    read-level public allows download but NOT new versions."""
    cat = world[ADMIN].catalog
    info = world["bob"].ingest(
        _csv(tmp_path, "ro.csv"), "bob_ro", public=False
    )
    sec.set_public(cat, info.ix, True, level="read", actor="bob", owner="bob")
    assert "".join(world["alice"].download(info)).startswith("a,b")
    with pytest.raises(PermissionDenied):
        world["alice"].ingest(_csv(tmp_path, "ro2.csv"), "bob_ro")


def test_grant_covers_later_versions(world, tmp_path):
    """ACLs anchor on the dataset (sourcename): a grant issued against
    one version's ix confers on versions added later."""
    cat = world[ADMIN].catalog
    info = world["bob"].ingest(
        _csv(tmp_path, "g1.csv"), "bobgrant", public=False
    )
    sec.grant(cat, info.ix, "alice", "read", actor=ADMIN)
    v2 = world["bob"].ingest(_csv(tmp_path, "g2.csv"), "bobgrant", public=False)
    assert "".join(world["alice"].download(v2)).startswith("a,b")
    with pytest.raises(PermissionDenied):
        world["carol"].download(v2).__next__()


def test_suid_probe_respects_acl(world, tmp_path):
    """A SUID re-ingest probe must not leak another user's private
    source metadata."""
    world["bob"].ingest(
        _csv(tmp_path, "s.csv"), "bobsuid", public=False,
        source_identifier="SECRET1",
    )
    with pytest.raises(PermissionDenied):
        world["alice"].ingest(
            _csv(tmp_path, "s2.csv"), "alice_probe", source_identifier="SECRET1"
        )


def test_extra_data_requires_parent_read(world, tmp_path):
    """Foreign-column ingest reads the parent — a caller without read
    rights on it must be refused."""
    md = _csv(tmp_path, "md.csv", "project-id,meta\nSRP1,v\n")
    world["bob"].ingest(md, "bob_md", public=False)
    data = _csv(tmp_path, "data.csv", "SRP1\ntrue\n")
    with pytest.raises(PermissionDenied):
        world["alice"].ingest_extra_data(
            data, "alice_extra", metadata_source="bob_md",
            metadata_field="project-id",
        )
    # with read rights it goes through
    cat = world[ADMIN].catalog
    parent = cat.get_source("bob_md")
    sec.grant(cat, parent.ix, "alice", "read", actor=ADMIN)
    info = world["alice"].ingest_extra_data(
        data, "alice_extra", metadata_source="bob_md",
        metadata_field="project-id",
    )
    assert info.row_count == 1


def test_update_user_cannot_publicize_private_dataset(world, tmp_path):
    """An update-level user adding a version must not be able to flip a
    private dataset public (found by review: set_public ran without an
    actor on the ingest path)."""
    cat = world[ADMIN].catalog
    info = world["bob"].ingest(
        _csv(tmp_path, "pp.csv"), "bobescal", public=False
    )
    sec.grant(cat, info.ix, "alice", "update", actor=ADMIN)
    # explicit public=True without manage rights is refused loudly
    with pytest.raises(PermissionDenied):
        world["alice"].ingest(_csv(tmp_path, "pp2.csv"), "bobescal", public=True)
    # the engine default silently inherits the dataset's (private)
    # visibility instead of escalating
    v2 = world["alice"].ingest(_csv(tmp_path, "pp2.csv"), "bobescal")
    assert v2.version == 2
    assert sec.dataset_public_level(cat, v2.ix) == 0
    with pytest.raises(PermissionDenied):
        world["carol"].download(v2).__next__()


def test_suid_reingest_needs_only_read(world, tmp_path):
    """An idempotent SUID re-ingest by a read-level user returns the
    existing source (reference Interface/Ingest.hs:160-174) — it must
    not demand add-version rights since nothing is added."""
    cat = world[ADMIN].catalog
    info = world["bob"].ingest(
        _csv(tmp_path, "sr.csv"), "bobread", public=False,
        source_identifier="RID1",
    )
    sec.grant(cat, info.ix, "alice", "read", actor=ADMIN)
    got = world["alice"].ingest(
        _csv(tmp_path, "sr2.csv"), "whatever", source_identifier="RID1"
    )
    assert got.ix == info.ix  # returned, not re-ingested


def test_creator_rights_survive_deleting_first_version(world, tmp_path):
    """Dataset ownership anchors on the sourcename row, not on whichever
    version happens to be earliest (found by review: deleting v1 handed
    creator rights to the next-earliest uploader)."""
    cat = world[ADMIN].catalog
    i1 = world["bob"].ingest(_csv(tmp_path, "cr.csv"), "bobanchor", public=False)
    sec.grant(cat, i1.ix, "alice", "update", actor=ADMIN)
    world["alice"].ingest(_csv(tmp_path, "cr2.csv"), "bobanchor", public=False)
    world["bob"].delete_source(i1)
    sec.revoke(cat, i1.ix, "alice", actor=ADMIN)
    # alice's grant is gone and she is NOT the creator — earliest
    # surviving version being hers must not confer creator rights
    with pytest.raises(PermissionDenied):
        world["alice"].ingest(_csv(tmp_path, "cr3.csv"), "bobanchor", public=False)
    # bob (the recorded creator) still can, despite owning no version
    v3 = world["bob"].ingest(_csv(tmp_path, "cr3.csv"), "bobanchor", public=False)
    assert v3.version == 3


def test_delete_requires_manage(world, tmp_path):
    cat = world[ADMIN].catalog
    info = world["bob"].ingest(_csv(tmp_path, "del.csv"), "bobdel")
    with pytest.raises(PermissionDenied):
        world["alice"].delete_source(info)  # public=update < manage
    sec.grant(cat, info.ix, "alice", "manage", actor=ADMIN)
    world["alice"].delete_source(info)
    # admin can always delete
    info2 = world["bob"].ingest(_csv(tmp_path, "del2.csv"), "bobdel2")
    world[ADMIN].delete_source(info2)


def test_suid_debris_sweep_is_owner_gated(world, tmp_path):
    """The crash-debris sweep on a SUID probe is DESTRUCTIVE (data-dir
    rmtree + catalog delete), so it is gated like vacuum: only the
    debris owner or an admin may trigger it. Round-8 advice: any
    ingest-capable user could previously destroy another writer's
    in-flight row just by probing its source_identifier."""
    cat = world[ADMIN].catalog
    # fabricate bob's crash debris: a pending row carrying the SUID tag
    # (a writer killed between the tag and the commit)
    ix, _v, _t, _vw = cat.new_source(
        name="bob_wip", url=None, description=None, added_by="bob",
        created=None, fmt="tabular",
    )
    cat.tag(ix, "SUID:CRASH9")

    # alice probing the identifier must NOT sweep bob's debris
    with pytest.raises(PermissionDenied, match="crashed ingest"):
        world["alice"].ingest(
            _csv(tmp_path, "probe.csv"), "alice_ds",
            source_identifier="CRASH9",
        )
    raw = cat.load("sources")
    assert len(raw[raw["ix"] == ix]) == 1  # debris intact

    # bob's own retry sweeps his debris and ingests fresh
    got = world["bob"].ingest(
        _csv(tmp_path, "retry.csv"), "bob_wip", source_identifier="CRASH9"
    )
    assert got.row_count == 2
    # the pending debris is gone — the only row left under this ix (the
    # sweep freed it for reallocation) is the COMMITTED retry
    raw = cat.load("sources")
    hit = raw[raw["ix"] == got.ix]
    assert len(hit) == 1 and not bool(hit.iloc[0]["pending"])
    assert not len(raw[raw["pending"].fillna(False).astype(bool)])
    assert cat.get_source("bob_wip").ix == got.ix
