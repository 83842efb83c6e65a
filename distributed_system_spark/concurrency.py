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
    ``localCheckpoint()`` or a write); exceptions propagate exactly
    as in the sequential form (the first failing thunk's error).

    ``inheritable_thread_target`` carries the caller's job
    group/description and tags into each worker thread, so UI
    labelling and cancellation behave as if the builds were
    submitted inline.
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    wrapped = [inheritable_thread_target(spark)(t) for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(w) for w in wrapped]
        return [f.result() for f in futures]
