"""Polish stage-boundary stores — schema parity with the reference.

Images:      summaries/<contig>_<start>_<end>_<chunk>/{image,label,position,
             index,contig,region_start,region_end,chunk_id}
             (pepper/modules/python/DataStore.py:53-67)
Predictions: predictions/<contig>/<contig-start-end>/<chunk_id>/{position,
             index,bases} + per-chunk contig_start/contig_end
             (DataStorePredict.py:49-74)
"""
import glob
import os
from typing import Iterator, List, Tuple

import h5py
import numpy as np


class PolishImageStore:
    def __init__(self, filename: str, mode: str = "r"):
        self.filename = filename
        self.fh = h5py.File(filename, mode)

    def close(self):
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def write_summary(self, region: Tuple[str, int, int], image, label,
                      position, index, chunk_id: int, summary_name: str):
        contig, region_start, region_end = region
        g = self.fh.create_group(f"summaries/{summary_name}")
        g.create_dataset("image", data=np.array(image, dtype=np.uint8))
        g.create_dataset("label", data=np.array(label, dtype=np.uint8))
        g.create_dataset("position", data=np.asarray(position, np.int64))
        g.create_dataset("index", data=np.asarray(index, np.int32))
        g["contig"] = contig
        g["region_start"] = region_start
        g["region_end"] = region_end
        g["chunk_id"] = chunk_id

    def summary_names(self) -> List[str]:
        return list(self.fh["summaries"].keys()) if "summaries" in self.fh else []

    def read_summary(self, name: str) -> dict:
        g = self.fh[f"summaries/{name}"]
        contig = g["contig"][()]
        return dict(
            image=g["image"][()], label=g["label"][()],
            position=g["position"][()], index=g["index"][()],
            contig=contig.decode() if isinstance(contig, bytes) else str(contig),
            region_start=int(g["region_start"][()]),
            region_end=int(g["region_end"][()]),
            chunk_id=int(g["chunk_id"][()]))


class PolishPredictionStore:
    def __init__(self, filename: str, mode: str = "r"):
        self.filename = filename
        self.fh = h5py.File(filename, mode)
        self._have_bounds = set()

    def close(self):
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def write_prediction(self, contig: str, contig_start: int,
                         contig_end: int, chunk_id: int, position, index,
                         predicted_bases):
        prefix = f"{contig}-{contig_start}-{contig_end}"
        if prefix not in self._have_bounds:
            self._have_bounds.add(prefix)
            self.fh[f"predictions/{contig}/{prefix}/contig_start"] = contig_start
            self.fh[f"predictions/{contig}/{prefix}/contig_end"] = contig_end
        g = self.fh.create_group(f"predictions/{contig}/{prefix}/{chunk_id}")
        g.create_dataset("position", data=np.asarray(position, np.int64))
        g.create_dataset("index", data=np.asarray(index, np.int32))
        g.create_dataset("bases",
                         data=np.asarray(predicted_bases).astype(np.uint8))

    def contigs(self) -> List[str]:
        return (list(self.fh["predictions"].keys())
                if "predictions" in self.fh else [])

    def chunk_keys(self, contig: str) -> List[Tuple[str, int, int]]:
        out = []
        for key in self.fh[f"predictions/{contig}"].keys():
            g = self.fh[f"predictions/{contig}/{key}"]
            out.append((key, int(g["contig_start"][()]),
                        int(g["contig_end"][()])))
        return out

    def read_chunks(self, contig: str, chunk_key: str):
        g = self.fh[f"predictions/{contig}/{chunk_key}"]
        for sub in sorted(set(g.keys()) - {"contig_start", "contig_end"}):
            sg = g[sub]
            yield (sg["bases"][()], sg["position"][()], sg["index"][()])


def polish_image_files(image_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(image_dir, "*.hdf"))
                  + glob.glob(os.path.join(image_dir, "*.hdf5"))
                  + glob.glob(os.path.join(image_dir, "*.h5")))
