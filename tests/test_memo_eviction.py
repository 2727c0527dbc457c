"""Memo hygiene (ADVICE r12): inserts evict entries held for other —
necessarily stopped — SparkContexts, so a long-lived process cannot
accumulate dead sessions' localCheckpoint handles."""

from hpctoolkit_dataframe_spark.queries import evict_dead_sessions


def test_evict_dead_sessions_drops_only_foreign_keys():
    cache = {("app-old", "/d1"): 1, ("app-old", "/d2"): 2,
             ("app-new", "/d1"): 3}
    evict_dead_sessions(cache, "app-new")
    assert cache == {("app-new", "/d1"): 3}


def test_evict_dead_sessions_keeps_multi_dir_same_session():
    # multi-dir caches (build_cct, pq_train) deliberately retain every
    # sf_dir of the LIVE session (the test battery cycles fixtures)
    cache = {("app", "/d1"): 1, ("app", "/d2"): 2}
    evict_dead_sessions(cache, "app")
    assert len(cache) == 2
