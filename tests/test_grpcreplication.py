"""gRPC WAL-shipping replication (grpcreplication.py) — the
replication/ package twin: live two-catalog streaming over real
sockets, resume cursors across disconnects, exactly-once replay, and
the retry loop (sender.go / grpc_server.go / receiver.go / replay.go /
retry.go)."""

import json
import os
import time

import pytest

from marketstore_spark import protowire, txn
from marketstore_spark.catalog import Catalog, TimeBucketKey
from marketstore_spark.grpcreplication import (
    ReplayGapError,
    ReplicationReceiver,
    _transaction_group,
    replay_transaction_group,
    replica_cursors,
    serve_replication_background,
)

KEY = "TEST/1Min/OHLCV"


def _wait(predicate, timeout=15.0, interval=0.05):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if predicate():
            return True
        time.sleep(interval)
    return False


def _rows(cat, key):
    return sorted(
        (r["id"], r["v"]) for r in cat.read(key).collect()
    )


def _mkdf(spark, lo, hi):
    return spark.createDataFrame(
        [(i, float(i) * 1.5) for i in range(lo, hi)], ["id", "v"]
    )


def test_wal_stream_replication_end_to_end(spark, tmp_path):
    """Commits on the primary appear exactly-once in the replica
    through the gRPC channel: initial catch-up from version 0, live
    tail of new commits, a mid-stream disconnect, and a cursor-exact
    resume that replays ONLY the missed records."""
    master_root = str(tmp_path / "master")
    replica_root = str(tmp_path / "replica")
    mcat = Catalog(spark, master_root)
    mbucket = TimeBucketKey(KEY).path(master_root)
    rbucket = TimeBucketKey(KEY).path(replica_root)

    mcat.write(KEY, _mkdf(spark, 0, 10))  # v0
    mcat.write(KEY, _mkdf(spark, 10, 20))  # v1

    srv, _ = serve_replication_background(master_root)
    try:
        rx = ReplicationReceiver(replica_root, "127.0.0.1", srv.port)
        thread = rx.run_in_background()

        # catch-up: both historical commits replay in order
        assert _wait(lambda: txn.current_version(rbucket) == 1)
        rcat = Catalog(spark, replica_root)
        assert _rows(rcat, KEY) == _rows(mcat, KEY)
        assert rx.replayed == 2 and rx.redelivered == 0

        # live tail: a new commit flows through the open stream
        mcat.write(KEY, _mkdf(spark, 20, 25))  # v2
        assert _wait(lambda: txn.current_version(rbucket) == 2)
        assert _rows(rcat, KEY) == _rows(mcat, KEY)

        # mid-stream disconnect: stop the receiver, advance the master
        rx.stop()
        thread.join(5)
        assert not thread.is_alive()
        mcat.write(KEY, _mkdf(spark, 25, 30))  # v3
        mcat.delete_range(KEY, -1, -1, ts_col="id")  # v4: replace commit
        assert txn.current_version(rbucket) == 2  # replica is behind

        # resume: a fresh receiver reads its cursor from the replica's
        # own manifest log and replays exactly the two missed commits
        rx2 = ReplicationReceiver(replica_root, "127.0.0.1", srv.port)
        thread2 = rx2.run_in_background()
        assert _wait(lambda: txn.current_version(rbucket) == 4)
        assert rx2.replayed == 2 and rx2.redelivered == 0
        assert _rows(rcat, KEY) == _rows(mcat, KEY)

        # replica manifests mirror the master's byte-for-byte content
        for v in range(5):
            assert txn.read_manifest(rbucket, v) == txn.read_manifest(
                mbucket, v
            )
        rx2.stop()
        thread2.join(5)
    finally:
        srv.shutdown()
        srv.server_close()


def test_receiver_retries_until_master_is_up(spark, tmp_path):
    """retry.go twin: a receiver started before the master exists
    backs off on the retryable connect failure and succeeds once the
    master comes up — no records lost."""
    master_root = str(tmp_path / "master")
    replica_root = str(tmp_path / "replica")
    mcat = Catalog(spark, master_root)
    mcat.write(KEY, _mkdf(spark, 0, 5))  # v0

    # reserve a port, then start the receiver against it BEFORE the
    # master server binds it
    import socket

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    rx = ReplicationReceiver(
        replica_root, "127.0.0.1", port, retry_interval=0.05, max_retries=60
    )
    thread = rx.run_in_background()
    time.sleep(0.3)  # several refused connects → backoff path exercised
    srv, _ = serve_replication_background(master_root, port=port)
    try:
        rbucket = TimeBucketKey(KEY).path(replica_root)
        assert _wait(lambda: txn.current_version(rbucket) == 0)
        assert rx.replayed == 1
        rx.stop()
        thread.join(5)
    finally:
        srv.shutdown()
        srv.server_close()


def test_replay_exactly_once_and_gap_guard(spark, tmp_path):
    """replay.go twin unit-level contracts: re-delivered records are
    idempotent no-ops (the os.link CAS), version gaps refuse to apply,
    and hostile record paths never escape the replica root."""
    master_root = str(tmp_path / "master")
    replica_root = str(tmp_path / "replica")
    mcat = Catalog(spark, master_root)
    mcat.write(KEY, _mkdf(spark, 0, 5))  # v0
    mcat.write(KEY, _mkdf(spark, 5, 9))  # v1
    mbucket = TimeBucketKey(KEY).path(master_root)

    tg0 = _transaction_group(mbucket, KEY, 0)
    tg1 = _transaction_group(mbucket, KEY, 1)
    # the record survives a protowire round trip intact
    tg1 = protowire.decode(
        "TransactionGroup", protowire.encode("TransactionGroup", tg1)
    )

    # applying v1 before v0 is a gap, not a silent skip
    with pytest.raises(ReplayGapError):
        replay_transaction_group(replica_root, tg1)

    assert replay_transaction_group(replica_root, tg0) is True
    assert replay_transaction_group(replica_root, tg0) is False  # re-delivery
    assert replay_transaction_group(replica_root, tg1) is True
    assert replay_transaction_group(replica_root, tg1) is False
    rbucket = TimeBucketKey(KEY).path(replica_root)
    assert txn.current_version(rbucket) == 1
    assert replica_cursors(replica_root) == {KEY: 2}

    # an append-only record ships ONLY the delta files, yet the
    # manifest lists the full set
    assert len(tg1["files"]) < len(json.loads(tg1["manifest_json"])["files"])
    for f in tg1["files"]:
        assert os.path.isfile(os.path.join(rbucket, f["rel_path"]))

    # hostile paths are rejected before any filesystem write
    with pytest.raises(ReplayGapError):
        replay_transaction_group(
            replica_root,
            {"key": "../escape/x/y", "version": 0, "manifest_json": "{}",
             "files": []},
        )
    with pytest.raises(ReplayGapError):
        replay_transaction_group(
            replica_root,
            {"key": "A/B/C", "version": 0, "manifest_json": "{}",
             "files": [{"rel_path": "../../evil", "payload": b"x"}]},
        )


def test_receiver_backoff_capped_and_stop_wakes(tmp_path):
    """Two retry-loop guarantees (neither needs a master): the backoff
    delay is capped at max_retry_delay so a persistent outage exhausts
    max_retries in bounded time instead of sleeping for ~310 days on
    the high attempts, and stop() wakes a receiver blocked mid-backoff
    immediately (the wait is on the stop event, not time.sleep)."""
    import socket
    import threading

    from marketstore_spark.grpcreplication import RetryableReplicationError

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()  # nothing ever listens here

    # 10 retries of interval 0.01 coeff 10 uncapped would be ~11 days;
    # capped at 0.02 the loop must exhaust in well under a second
    rx = ReplicationReceiver(
        str(tmp_path / "replica"), "127.0.0.1", port,
        retry_interval=0.01, backoff_coeff=10, max_retries=10,
        max_retry_delay=0.02,
    )
    t0 = time.time()
    with pytest.raises(RetryableReplicationError):
        rx.run()
    assert time.time() - t0 < 5.0, "backoff cap not applied"

    # stop() mid-backoff: huge base interval would sleep ~60s; the
    # event wait must return the moment stop() is called
    rx2 = ReplicationReceiver(
        str(tmp_path / "replica2"), "127.0.0.1", port,
        retry_interval=60.0, max_retries=5,
    )
    thread = threading.Thread(target=rx2.run, daemon=True)
    thread.start()
    time.sleep(0.3)  # let it fail the first connect and enter backoff
    rx2.stop()
    thread.join(3.0)
    assert not thread.is_alive(), "stop() did not wake the backoff wait"
