"""Driver-side concurrency helper for INDEPENDENT eager builds.

``localCheckpoint()`` is a blocking action: a query that materializes
two independent subtrees (e.g. a band table and a norm table, or an
image-signature table and a text-fingerprint table) pays their build
walls back to back, leaving each build's stage tail idle.  Spark's
scheduler happily runs several jobs at once inside one application —
actions are only sequential because driver code calls them
sequentially (guide §2.6 "overlap independent jobs") — so submitting
the builds from a small thread pool lets the second build's tasks
back-fill executors freed by the first build's tail.

Only INDEPENDENT builds belong here: a thunk must not consume another
thunk's result (a dependent checkpoint chain stays sequential at its
call site, e.g. the curation family's survivor set -> token sets).
"""

from __future__ import annotations

from typing import Any, Callable


def eager_all(spark, *thunks: Callable[[], Any]) -> list:
    """Run driver thunks concurrently and return their results in
    order.  Each thunk typically forces an eager build (a
    ``localCheckpoint()`` or a write).  The first failing thunk's
    error is raised, but unlike the sequential form every thunk runs
    to completion first (results are only collected afterwards) —
    callers must tolerate later side effects when an earlier thunk
    fails.

    ``inheritable_thread_target`` carries the caller's job
    group/description and tags into each worker thread, so UI
    labelling and cancellation behave as if the builds were
    submitted inline.
    """
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # With py4j pinned-thread mode ON (the default),
    # inheritable_thread_target(spark) returns a decorator; with
    # PYSPARK_PIN_THREAD=false the non-ClientServer branch returns
    # its argument unchanged — i.e. the session itself, which is not
    # callable on a function.  Fall back to the direct form there
    # (thread-locals are shared across threads in non-pinned mode,
    # so no wrapping is needed).
    def _wrap(t):
        w = inheritable_thread_target(spark)
        if w is spark or not callable(w):
            return inheritable_thread_target(t)
        return w(t)

    wrapped = [_wrap(t) for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(w) for w in wrapped]
        return [f.result() for f in futures]
