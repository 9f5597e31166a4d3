"""Network-backed storage contract (state/s3_storage.py): the same
lifecycle the ObjectStoreStorage emulation certifies, but with the
fence arbitrated by an S3-protocol service over real HTTP round-trips
(MiniS3Server — conditional PUT / plain PUT / DELETE / list)."""

import os
import subprocess
import sys
import threading

import pytest

from xgeo_ray.state.s3_storage import MiniS3Server, S3Client, S3ObjectStorage


@pytest.fixture(scope="module")
def server():
    s = MiniS3Server()
    yield s
    s.close()


@pytest.fixture()
def storage(server):
    return S3ObjectStorage(S3Client(server.endpoint, "xgeo"))


def test_commit_bytes_exclusive_is_exclusive(tmp_path, storage, server):
    p = str(tmp_path / "manifests" / "epoch=000001.json")
    storage.commit_bytes_exclusive(p, b'{"a":1}')
    assert open(p, "rb").read() == b'{"a":1}'  # write-through local cache
    # the BUCKET holds the authoritative copy
    assert storage.client.get_object(storage._key_of(p)) == b'{"a":1}'
    with pytest.raises(FileExistsError):
        storage.commit_bytes_exclusive(p, b'{"a":2}')
    assert storage.client.get_object(storage._key_of(p)) == b'{"a":1}'


def test_publish_file_last_writer_wins(tmp_path, storage):
    final = str(tmp_path / "part.parquet")
    for k in range(2):
        tmp = final + f".tmp-{k}"
        with open(tmp, "wb") as f:
            f.write(b"v%d" % k)
        storage.publish_file(tmp, final, durable=True)
    assert open(final, "rb").read() == b"v1"
    assert storage.client.get_object(storage._key_of(final)) == b"v1"


def test_delete_control_allows_reclaim(tmp_path, storage):
    p = str(tmp_path / "lease.json")
    storage.commit_bytes_exclusive(p, b"a")
    storage.delete_control(p)
    storage.commit_bytes_exclusive(p, b"b")  # reclaimable after delete
    assert storage.client.get_object(storage._key_of(p)) == b"b"


def test_concurrent_claims_exactly_one_winner(tmp_path, server):
    """N threads race one conditional PUT through separate HTTP
    clients: the SERVICE must admit exactly one."""
    p = str(tmp_path / "race" / "epoch=000007.json")
    results = []

    def claim(i):
        st = S3ObjectStorage(S3Client(server.endpoint, "xgeo"))
        try:
            st.commit_bytes_exclusive(p, b"winner=%d" % i)
            results.append(i)
        except FileExistsError:
            pass

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 1


def test_list_keys_prefix(tmp_path, storage):
    base = str(tmp_path / "pfx")
    for n in ("a.json", "b.json"):
        storage.commit_bytes_exclusive(os.path.join(base, n), b"x")
    keys = storage.client.list_keys(storage._key_of(base) + "/")
    assert sorted(os.path.basename(k) for k in keys) == ["a.json", "b.json"]


def test_full_lifecycle_on_s3_backend(tmp_path, server):
    """The REAL engine — ingest, crash before commit, resume, snapshot
    parity, consumer ack — in fresh processes with XGEO_STORAGE=s3: the
    commit fence of every epoch in driver AND workers is arbitrated by
    the S3 service's conditional PUT over HTTP."""
    work = str(tmp_path)
    script = f"""
import os, sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from xgeo_ray.state.storage import DEFAULT_STORAGE
assert type(DEFAULT_STORAGE).__name__ == "S3ObjectStorage", type(DEFAULT_STORAGE)
from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable
import pandas as pd

phase = sys.argv[1]
work = {work!r}
if phase == "setup":
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5)
    fx.write_segments(ev, work + "/wal", n_segments=4)
    DeltaTable.create(work + "/t", num_partitions=4, num_salts=1)
elif phase == "crash":
    t = DeltaTable.open(work + "/t")
    segs = sorted(work + "/wal/" + n for n in os.listdir(work + "/wal"))
    ing.run_stream(t, segs[:2], segments_per_epoch=2)
    os.environ["XGEO_CRASH_BEFORE_COMMIT"] = "1"
    ing.run_stream(t, segs, segments_per_epoch=2)
elif phase == "resume":
    import pyarrow as pa, pyarrow.parquet as pq
    t = DeltaTable.open(work + "/t")
    segs = sorted(work + "/wal/" + n for n in os.listdir(work + "/wal"))
    ing.run_stream(t, segs, segments_per_epoch=2)
    got = ing.snapshot(t).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ev = pa.concat_tables([pq.read_table(s) for s in segs])
    want = fx.naive_final_state(None, ev).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    from xgeo_ray.state import consumers as cons
    cons.ack(t, "g1", t.latest_epoch())
    assert cons.position(t, "g1") == t.latest_epoch()
    print("S3-OK")
ray.shutdown()
"""
    env = {
        **os.environ,
        "XGEO_STORAGE": "s3",
        "XGEO_S3_ENDPOINT": server.endpoint,
        "XGEO_S3_BUCKET": "xgeo",
    }

    def run(phase):
        return subprocess.run(
            [sys.executable, "-c", script, phase],
            env=env,
            cwd="/root/repo",
            capture_output=True,
            text=True,
        )

    r = run("setup")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run("crash")
    assert r.returncode == 137, (r.returncode, r.stderr[-2000:])
    # fence held: the crashed epoch committed no manifest — locally OR
    # in the bucket
    mans = os.listdir(os.path.join(work, "t", "manifests"))
    assert not any("000002" in n and n.endswith(".json") for n in mans)
    st = S3ObjectStorage(S3Client(server.endpoint, "xgeo"))
    bucket_mans = st.client.list_keys(
        st._key_of(os.path.join(work, "t", "manifests")) + "/"
    )
    assert not any("000002" in k for k in bucket_mans)
    r = run("resume")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "S3-OK" in r.stdout
    # every committed manifest exists in the bucket (the authority)
    mans = [
        n
        for n in os.listdir(os.path.join(work, "t", "manifests"))
        if n.endswith(".json")
    ]
    bucket_mans = st.client.list_keys(
        st._key_of(os.path.join(work, "t", "manifests")) + "/"
    )
    assert {os.path.basename(k) for k in bucket_mans} >= set(mans)


def test_list_keys_follows_pagination(storage):
    keys = [f"pagetest/k{i:03d}" for i in range(7)]
    for k in keys:
        storage.client.put_object(k, b"x")
    # page_size=2 forces 4 ListObjectsV2 round-trips
    got = storage.client.list_keys("pagetest/", page_size=2)
    assert got == keys


def test_ambiguous_conditional_put_resolves_by_readback(storage, monkeypatch):
    """A conditional PUT whose connection dies after the server applied
    it must NOT be blindly resent (that turns a won fence into a false
    412): put_object reads back and compares."""
    from xgeo_ray.state import s3_storage as m

    client = storage.client
    real_request = client._request

    calls = {"n": 0}

    def flaky(method, path, body=None, headers=None, retry=True):
        if method == "PUT" and headers and "If-None-Match" in headers:
            calls["n"] += 1
            if calls["n"] == 1:
                # the server APPLIED the write, then the connection died
                real_request(method, path, body, headers, retry=True)
                raise m.S3AmbiguousError("connection died mid-response")
        return real_request(method, path, body, headers, retry=retry)

    monkeypatch.setattr(client, "_request", flaky)
    # our own write was applied -> ambiguity resolves to SUCCESS
    client.put_object("amb/won", b"mine", if_none_match=True)
    assert client.get_object("amb/won") == b"mine"

    # someone else's bytes are there -> ambiguity resolves to LOST
    calls["n"] = 0
    client.put_object("amb/lost", b"theirs")  # pre-existing plain object
    with pytest.raises(FileExistsError):
        client.put_object("amb/lost", b"mine", if_none_match=True)
    assert client.get_object("amb/lost") == b"theirs"

    # nothing applied -> safe resend succeeds
    calls["n"] = 0

    def flaky_noapply(method, path, body=None, headers=None, retry=True):
        if method == "PUT" and headers and "If-None-Match" in headers:
            calls["n"] += 1
            if calls["n"] == 1:
                raise m.S3AmbiguousError("connection died before send")
        return real_request(method, path, body, headers, retry=retry)

    monkeypatch.setattr(client, "_request", flaky_noapply)
    client.put_object("amb/retry", b"mine", if_none_match=True)
    assert client.get_object("amb/retry") == b"mine"


def test_commit_heals_local_cache_after_crash_window(tmp_path, storage):
    """Crash after the bucket PUT but before the local write-through:
    the retry must backfill the local manifest from the bucket (or the
    table wedges on 412 forever), then report the lost fence."""
    p = str(tmp_path / "heal" / "manifests" / "epoch=000001.json")
    key = storage._key_of(p)
    # simulate the dead attempt: bucket has the manifest, local does not
    storage.client.put_object(key, b'{"epoch":1}', if_none_match=True)
    assert not os.path.exists(p)
    with pytest.raises(FileExistsError):
        storage.commit_bytes_exclusive(p, b'{"epoch":1,"retry":true}')
    # the local cache now mirrors the authoritative bucket copy
    assert open(p, "rb").read() == b'{"epoch":1}'
