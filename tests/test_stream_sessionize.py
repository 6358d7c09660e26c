"""Stateful streaming sessionization (applyInPandasWithState): closed
sessions match the batch gap semantics."""

import os
import shutil
from datetime import datetime

from morph_xr2rml_spark.streaming import stream_sessionize

DIR = "/tmp/mxs_sess_in"
CKPT = "/tmp/mxs_sess_ckpt"


def test_stream_sessionize_closes_gapped_sessions(spark):
    shutil.rmtree(DIR, ignore_errors=True)
    shutil.rmtree(CKPT, ignore_errors=True)
    os.makedirs(DIR)
    # user 1: two sessions separated by a 2h gap; user 2: one session.
    # a final sentinel event per user (far future) closes the last session
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 12:30:00"), (1, "2024-01-01 12:40:00"),
        (2, "2024-01-01 09:00:00"),
        (1, "2024-06-01 00:00:00"),  # sentinel closes session 2 of user 1
        (2, "2024-06-01 00:00:00"),  # sentinel closes user 2's session
    ]
    with open(f"{DIR}/events.csv", "w") as f:
        for uid, ts in rows:
            f.write(f"{uid},{ts}\n")
    stream = (spark.readStream.format("csv")
              .schema("user_id long, ts timestamp").load(DIR))
    sessions = stream_sessionize(stream, gap_minutes=30)
    q = (sessions.writeStream.format("memory").queryName("sess_out")
         .option("checkpointLocation", CKPT)
         .trigger(availableNow=True).start())
    # with stateful processing-time timeouts the availableNow query can
    # linger on timeout bookkeeping; poll for the expected rows instead
    # of waiting for full termination, then stop it
    import time
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("select * from sess_out").count() >= 3:
            break
        time.sleep(1)
    q.stop()
    got = {(r.user_id, str(r.session_start), str(r.session_end), r.n_events)
           for r in spark.sql("select * from sess_out").collect()}
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2) in got
    assert (1, "2024-01-01 12:30:00", "2024-01-01 12:40:00", 2) in got
    assert (2, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1) in got
    # the sentinel sessions themselves remain OPEN (not emitted)
    assert all(not s.startswith("2024-06") for _u, s, _e, _n in got)


def test_stream_sessionize_string_user_ids(spark):
    """ADVICE r2: output schema derives from the input user column type —
    string ids must work (previously hardcoded 'long')."""
    import time
    d, ckpt = "/tmp/mxs_sess_in_str", "/tmp/mxs_sess_ckpt_str"
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(d)
    rows = [("alice", "2024-01-01 10:00:00"), ("alice", "2024-01-01 10:05:00"),
            ("alice", "2024-06-01 00:00:00")]  # sentinel closes the session
    with open(f"{d}/events.csv", "w") as f:
        for uid, ts in rows:
            f.write(f"{uid},{ts}\n")
    stream = (spark.readStream.format("csv")
              .schema("user_id string, ts timestamp").load(d))
    sessions = stream_sessionize(stream, gap_minutes=30)
    q = (sessions.writeStream.format("memory").queryName("sess_out_str")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("select * from sess_out_str").count() >= 1:
            break
        time.sleep(1)
    q.stop()
    got = {(r.user_id, str(r.session_start), str(r.session_end), r.n_events)
           for r in spark.sql("select * from sess_out_str").collect()}
    assert ("alice", "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2) in got
