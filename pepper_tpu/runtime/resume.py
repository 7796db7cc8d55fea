"""Per-region resume journal for the streamed call_variant path.

SURVEY §5.4: the reference's only pipeline "checkpoint" is the stage
directory — a crashed 3 Gbp run re-encodes everything. Here the stream
appends every flushed prediction batch (plus per-interval row totals) to
an append-only journal; after a crash, the re-run replays the journal,
feeds the completed intervals' predictions straight into stage 3, and
re-encodes ONLY the intervals that never finished. The journal is
crash-safe by construction: records are length-prefixed and
CRC-guarded, so a torn tail write is detected and dropped rather than
corrupting the resume (unlike the HDF5 store, which has no
crash-consistency story). Deleted on successful completion.

Record types (pickled tuples):
  ("total", interval_idx, n_rows)                   - encode-side counts
  ("batch", contigs, positions, depths, cand_lists, freqs, probs, runs)
"""
import os
import pickle
import struct
import threading
import zlib
from typing import Dict, List, Optional, Tuple


def _fingerprint(intervals, model_path: str) -> bytes:
    import hashlib
    h = hashlib.md5()
    for contig, start, end in intervals:
        h.update(f"{contig}:{start}-{end};".encode())
    h.update(os.path.abspath(model_path or "").encode())
    h.update(os.environ.get("PEPPER_TPU_PRECISION", "bf16").encode())
    return h.hexdigest().encode()


class ResumeJournal:
    """Append-only writer. One instance per stream; append() is called
    from the flusher thread and the main loop — guarded by the caller
    (writes happen only under the flush path's ordering)."""

    MAGIC = b"PTRJ1"

    def __init__(self, path: str, intervals, model_path: str):
        self.path = path
        self._lock = threading.Lock()   # flusher + main loop both append
        # truncate to the last VALID record first: appending after a torn
        # tail would hide everything written from then on
        valid_end = _valid_length(path) if os.path.isfile(path) else 0
        self._fh = open(path, "r+b" if valid_end else "wb")
        self._fh.truncate(valid_end)
        self._fh.seek(valid_end)
        if valid_end == 0:
            self._raw(self.MAGIC + _fingerprint(intervals, model_path))

    def _raw(self, payload: bytes) -> None:
        crc = zlib.crc32(payload)
        self._fh.write(struct.pack("<II", len(payload), crc))
        self._fh.write(payload)
        # flush to the OS, no fsync: page-cache data survives kill -9 (the
        # resume threat model); a record lost to an OS crash only means
        # one interval re-encodes — the CRC framing drops any torn tail
        self._fh.flush()

    def append(self, record) -> None:
        with self._lock:
            self._raw(pickle.dumps(record, protocol=4))

    def close(self) -> None:
        self._fh.close()

    def delete(self) -> None:
        self.close()
        try:
            os.remove(self.path)
        except OSError:
            pass


def _read_records(path: str) -> List[bytes]:
    out = []
    with open(path, "rb") as fh:
        while True:
            hdr = fh.read(8)
            if len(hdr) < 8:
                break
            n, crc = struct.unpack("<II", hdr)
            payload = fh.read(n)
            if len(payload) < n or zlib.crc32(payload) != crc:
                break   # torn tail write: drop it and everything after
            out.append(payload)
    return out


def _valid_length(path: str) -> int:
    """Byte offset just past the last CRC-valid record."""
    end = 0
    with open(path, "rb") as fh:
        while True:
            hdr = fh.read(8)
            if len(hdr) < 8:
                break
            n, crc = struct.unpack("<II", hdr)
            payload = fh.read(n)
            if len(payload) < n or zlib.crc32(payload) != crc:
                break
            end += 8 + n
    return end


def load_journal(path: str, intervals, model_path: str
                 ) -> Optional[Tuple[Dict[int, int], List[tuple]]]:
    """Replay a journal. Returns (interval totals, batch records) or None
    when absent / unreadable / written for different intervals or model."""
    if not os.path.isfile(path):
        return None
    raws = _read_records(path)
    want = ResumeJournal.MAGIC + _fingerprint(intervals, model_path)
    if not raws or raws[0] != want:
        return None
    totals: Dict[int, int] = {}
    batches: List[tuple] = []
    for raw in raws[1:]:
        try:
            rec = pickle.loads(raw)
        except Exception:
            break
        if rec[0] == "total":
            totals[rec[1]] = rec[2]
        elif rec[0] == "batch":
            batches.append(rec[1:])
    return totals, batches


def completed_intervals(totals: Dict[int, int],
                        batches: List[tuple]) -> Dict[int, int]:
    """Interval idx -> total rows, for intervals whose every row reached
    a flushed batch (safe to skip re-encoding)."""
    flushed: Dict[int, int] = {}
    for rec in batches:
        for idx, k in rec[6]:
            flushed[idx] = flushed.get(idx, 0) + k
    return {idx: n for idx, n in totals.items()
            if flushed.get(idx, 0) >= n}


def replay_slices(batches: List[tuple], completed: Dict[int, int]):
    """Yield (contigs, positions, depths, cand_lists, freqs, probs, runs)
    restricted to completed intervals, in original flush order (so
    within-interval candidate order — and therefore the final VCF — is
    byte-identical to an uninterrupted run)."""
    import numpy as np
    for contigs, positions, depths, cand_lists, freqs, probs, runs in batches:
        lo = 0
        keep = []
        keep_runs = []
        for idx, k in runs:
            if idx in completed:
                keep.append((lo, lo + k))
                keep_runs.append((idx, k))
            lo += k
        if not keep:
            continue
        sel = np.concatenate([np.arange(a, b) for a, b in keep])
        yield ([contigs[i] for i in sel], np.asarray(positions)[sel],
               np.asarray(depths)[sel], [cand_lists[i] for i in sel],
               np.asarray(freqs)[sel], np.asarray(probs)[sel], keep_runs)
