"""Trained-model download: manifest parse + per-model fetch.

Parity: pepper/modules/python/download_model.py:10-27 — fetch a CSV
manifest of `name,url` rows, then download each model that is not already
present, logging EXISTS/DOWNLOADING lines. The fetcher is injectable so the
logic is testable offline (file:// manifests in CI) and so zero-egress
environments get a clear error instead of a silent hang.
"""
import os
import shutil
import sys
import urllib.request
from datetime import datetime
from typing import Callable, List, Optional, Tuple

MANIFEST_URL = ("https://storage.googleapis.com/kishwar-helen/"
                "models_pepper/pepper_model_description.csv")

Fetcher = Callable[[str, str], None]


def _log(msg: str) -> None:
    sys.stderr.write("[" + datetime.now().strftime("%m-%d-%Y %H:%M:%S")
                     + "] INFO: " + msg + "\n")
    sys.stderr.flush()


def urllib_fetcher(url: str, dest_path: str) -> None:
    """Default fetcher: stream `url` to `dest_path` (http/https/file)."""
    with urllib.request.urlopen(url) as resp, open(dest_path, "wb") as out:
        shutil.copyfileobj(resp, out)


def parse_manifest(text: str) -> List[Tuple[str, str]]:
    """CSV manifest rows -> [(model_name, model_url)]; blank lines skipped."""
    models = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        name, url = line.split(",", 1)
        models.append((name.strip(), url.strip()))
    return models


def download_models(output_dir: str,
                    manifest_url: str = MANIFEST_URL,
                    fetcher: Optional[Fetcher] = None) -> List[str]:
    """Download every model in the manifest; returns downloaded/kept paths."""
    fetcher = fetcher or urllib_fetcher
    if not output_dir.endswith("/"):
        output_dir += "/"
    os.makedirs(output_dir, exist_ok=True)

    manifest_path = output_dir + "pepper_model_description.csv"
    fetcher(manifest_url, manifest_path)
    with open(manifest_path) as fh:
        models = parse_manifest(fh.read())
    os.remove(manifest_path)

    paths = []
    for model_name, model_url in models:
        dest = output_dir + model_name + ".pkl"
        paths.append(dest)
        if os.path.exists(dest):
            sys.stderr.write(f"INFO: MODEL EXISTS {model_name}.pkl\n")
            continue
        _log(f"DOWNLOADING FILE: {model_name}.pkl")
        _log(f"DOWNLOADING LINK: {model_url}")
        fetcher(model_url, dest)
    return paths
