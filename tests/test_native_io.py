"""Native (C++) BAM fetcher vs pure-Python oracle: field-exact parity."""
import numpy as np
import pytest

from pepper_tpu.io.bam_reader import BamReader
from pepper_tpu.native import bamio
from tests.util.synth import (plant_variants, random_genome,
                              simulate_reads, write_dataset)

pytestmark = pytest.mark.skipif(not bamio.available(),
                                reason=f"native build failed: {bamio.build_error()}")


@pytest.fixture(scope="module")
def bam(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("native"))
    genome = random_genome(30000, seed=5)
    variants = plant_variants(dict(genome), 8, 4, 4, seed=6)
    records = simulate_reads(genome, variants, coverage=25, seed=7,
                             error_rate=0.05, hp_tags=True)
    fasta, bam_path = write_dataset(tmp, genome, records)
    return bam_path


@pytest.mark.parametrize("region", [(0, 30000), (1000, 1100), (29900, 30000),
                                    (15000, 15001), (0, 1)])
@pytest.mark.parametrize("filters", [(False, 0, 0), (False, 10, 15),
                                     (True, 60, 1)])
def test_native_matches_python(bam, region, filters):
    start, stop = region
    incl, mapq, baseq = filters
    with BamReader(bam) as reader:
        py = reader.get_reads("contig1", start, stop, incl, mapq, baseq,
                              backend="python")
        nat = reader.get_reads("contig1", start, stop, incl, mapq, baseq,
                               backend="native")
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.query_name == b.query_name
        assert a.pos == b.pos and a.pos_end == b.pos_end
        assert a.sequence == b.sequence
        assert a.base_qualities == b.base_qualities
        assert a.cigar_tuples == b.cigar_tuples
        assert a.mapping_quality == b.mapping_quality
        assert a.flags == b.flags
        assert a.hp_tag == b.hp_tag
        assert a.bad_indices == b.bad_indices


def test_native_is_default_backend(bam, monkeypatch):
    with BamReader(bam) as reader:
        auto = reader.get_reads("contig1", 0, 5000)
        py = reader.get_reads("contig1", 0, 5000, backend="python")
    assert len(auto) == len(py)
    monkeypatch.setenv("PEPPER_TPU_NO_NATIVE", "1")
    with BamReader(bam) as reader:
        forced = reader.get_reads("contig1", 0, 5000)
    assert len(forced) == len(py)


def test_concurrent_first_load_single_cdll():
    """Regression: concurrent first _load() calls must produce ONE bound CDLL.

    Two racing CDLL() constructions would leave one object without argtypes;
    a later encode through it fails ctypes float conversion (bench.py's
    threaded encode hit this)."""
    import subprocess
    import sys
    code = r"""
import threading
from pepper_tpu.native import bamio
libs = [None] * 16
def grab(i):
    bamio._load()
    libs[i] = bamio._lib
threads = [threading.Thread(target=grab, args=(i,)) for i in range(16)]
[t.start() for t in threads]
[t.join() for t in threads]
assert all(l is libs[0] and l is not None for l in libs), "racing CDLLs"
assert bamio._lib.bam_fetch_region.argtypes is not None
print("OK")
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
