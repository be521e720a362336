"""Pull-queue consumer (the reference's `sequin_stream` sink).

Reference semantics (lib/sequin_web/controllers/pull_controller.ex:14-53,
slot_message_store_state.ex:286-300,432-478):

- receive(batch_size): lease up to n deliverable messages — group-blocked
  and visibility-aware — returns ack_ids; leased messages get
  not_visible_until = now + ack_wait;
- ack(ack_ids): remove permanently;
- nack(ack_ids): make immediately deliverable again;
- stale leases (past ack_wait) auto-return to deliverable.

Storage is a parquet-backed message table + lease map, driver-local —
the per-consumer store in the reference is likewise a single process
per partition; the scale path shards PullQueue instances by group hash
(partition_count, same as DeliveryEngine).
"""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame


class PullQueue:
    def __init__(self, state_dir: str, ack_wait_s: float = 30.0):
        self.state_dir = state_dir
        self.ack_wait_s = ack_wait_s
        self._messages = pd.DataFrame(
            columns=["ack_id", "group_id", "commit_lsn", "commit_idx", "value",
                     "deliver_count", "not_visible_until", "state"]
        )
        os.makedirs(state_dir, exist_ok=True)
        self._load()

    # --- persistence ------------------------------------------------------
    @property
    def _path(self) -> str:
        return os.path.join(self.state_dir, "messages.parquet")

    def _load(self) -> None:
        if os.path.exists(self._path):
            self._messages = pq.read_table(self._path).to_pandas()

    def _save(self) -> None:
        pq.write_table(
            pa.Table.from_pandas(self._messages, preserve_index=False), self._path
        )

    # --- ingestion --------------------------------------------------------
    def ingest(self, df: DataFrame) -> int:
        """Add events (canonical schema with a serialized `value` column)."""
        pdf = df.select("group_id", "commit_lsn", "commit_idx", "value").toPandas()
        pdf["ack_id"] = [uuid.uuid4().hex for _ in range(len(pdf))]
        pdf["deliver_count"] = 0
        pdf["not_visible_until"] = 0.0
        pdf["state"] = "available"
        # replay dedup on (lsn, idx)
        merged = (
            pd.concat([self._messages, pdf], ignore_index=True)
            if len(self._messages)
            else pdf
        )
        merged = merged.drop_duplicates(subset=["commit_lsn", "commit_idx"], keep="first")
        self._messages = merged
        self._save()
        return len(self._messages)

    # --- pull API ---------------------------------------------------------
    def receive(self, batch_size: int = 10) -> list[dict]:
        """Deliverable selection (slot_message_store_state.ex:432-478):
        cursor order; a group with an outstanding leased message is
        blocked; visibility timeouts respected."""
        now = time.time()
        m = self._messages
        # stale leases return to available (nack_stale_produced_messages)
        stale = (m["state"] == "delivered") & (m["not_visible_until"] <= now)
        m.loc[stale, "state"] = "available"

        m = m.sort_values(["commit_lsn", "commit_idx"]).reset_index(drop=True)
        leased_groups = set(m.loc[m["state"] == "delivered", "group_id"].dropna())
        out: list[dict] = []
        for idx, row in m.iterrows():
            if len(out) >= batch_size:
                break
            if row["state"] != "available" or row["not_visible_until"] > now:
                continue
            gid = row["group_id"]
            if gid is not None and not pd.isna(gid) and gid in leased_groups:
                continue  # group blocked by outstanding lease
            m.loc[idx, "state"] = "delivered"
            m.loc[idx, "deliver_count"] = row["deliver_count"] + 1
            m.loc[idx, "not_visible_until"] = now + self.ack_wait_s
            if gid is not None and not pd.isna(gid):
                leased_groups.add(gid)
            out.append(
                {"ack_id": row["ack_id"], "data": row["value"],
                 "group_id": gid, "deliver_count": int(row["deliver_count"]) + 1}
            )
        self._messages = m
        self._save()
        return out

    def ack(self, ack_ids: list[str]) -> int:
        before = len(self._messages)
        self._messages = self._messages[~self._messages["ack_id"].isin(ack_ids)]
        self._save()
        return before - len(self._messages)

    def nack(self, ack_ids: list[str]) -> int:
        """reset_message_visibilities: immediately deliverable again."""
        mask = self._messages["ack_id"].isin(ack_ids)
        self._messages.loc[mask, "state"] = "available"
        self._messages.loc[mask, "not_visible_until"] = 0.0
        self._save()
        return int(mask.sum())

    def depth(self) -> int:
        return len(self._messages)
