"""Iterative-sampler state lifecycle: localCheckpoint + explicit release.

Shared by DistributedGibbs (M1/M2/M3/M5) and OntoPartGibbs (M6). Both
samplers rewrite their full token state once per sweep via mapInPandas;
without intervention that (a) chains one mapInPandas per sweep into an
O(n)-deep plan, and (b) keeps every sweep's count broadcast referenced
for task re-serialization — an unbounded leak at the reference's 500 to
2000 production sweeps. The discipline here:

  - localCheckpoint(eager) each new state: materializes it AND truncates
    lineage (O(1) plan; the sweep's broadcast becomes unreferenced);
  - checkpoint RDDs bypass the CacheManager, so DataFrame.unpersist()
    is a NO-OP for them — the persisted RDD handles are captured at
    checkpoint time and released at the RDD level one sweep later
    (releasing earlier would destroy live blocks: a checkpointed plan
    cannot recompute);
  - the previous sweep's broadcast is destroy()ed once the next state
    is materialized (deferred one sweep out of caution).

The 105-sweep soak in test_gibbs_kernels.py asserts flat plan size and
flat persisted-block count under this discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CheckpointedStateLifecycle:
    """Mixin; requires ``self.spark``. Call _init_state_lifecycle() in
    __init__."""

    def _init_state_lifecycle(self) -> None:
        self._state_handles: list = []
        self._pending_release: list = []
        self._bc_prev = None

    def _local_checkpoint(self, df: DataFrame) -> DataFrame:
        jsc = self.spark.sparkContext._jsc
        before = {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}
        out = df.localCheckpoint(eager=True)
        pr = jsc.getPersistentRDDs()
        old_handles = self._state_handles
        self._state_handles = [
            pr.get(i) for i in pr.keySet().toArray() if int(i) not in before
        ]
        self._pending_release = old_handles
        return out

    def _release_old_state(self, old: DataFrame) -> None:
        old.unpersist()  # covers a plain-persisted state (restore path)
        for h in self._pending_release:
            try:
                h.unpersist(False)
            except Exception:  # noqa: BLE001 — already released is fine
                pass
        self._pending_release = []

    def _retire_broadcast(self, bc) -> None:
        """Destroy the PREVIOUS sweep's broadcast and remember ``bc`` as
        the one to destroy next sweep."""
        if self._bc_prev is not None:
            try:
                self._bc_prev.destroy()
            except Exception:  # noqa: BLE001 — already cleaned is fine
                pass
        self._bc_prev = bc

    def _destroy_broadcast_now(self, bc) -> None:
        try:
            bc.destroy()
        except Exception:  # noqa: BLE001
            pass
