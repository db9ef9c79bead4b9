"""Model download: -hf/--hf-repo resolution + cached, resumable fetches.

TPU-side equivalent of the reference's common/download.cpp:
  * repo:tag parsing (common_download_split_repo_tag)
  * manifest resolution — <endpoint>v2/<repo>/manifests/<tag> returns the
    GGUF file for a quant tag (common_get_hf_file)
  * cached single-file download with .etag sidecars, Range resume on a
    .downloadInProgress partial, atomic rename (common_download_file_single)
  * GGUF split awareness: -00001-of-0000N siblings fetched after shard 1

The sandbox this framework is developed in has zero egress, so everything
network-facing is injected through `endpoint` / opener and unit-tested
against a localhost HTTP server (tests/test_download.py); against the real
hub the defaults reproduce the reference behavior.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.error
import urllib.request

DEFAULT_ENDPOINT = "https://huggingface.co/"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def model_endpoint() -> str:
    """≡ get_model_endpoint: MODEL_ENDPOINT / HF_ENDPOINT env overrides."""
    ep = os.environ.get("MODEL_ENDPOINT") or os.environ.get("HF_ENDPOINT") \
        or DEFAULT_ENDPOINT
    return ep if ep.endswith("/") else ep + "/"


def cache_dir() -> str:
    d = os.environ.get("TPULLM_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "tpullm")
    os.makedirs(d, exist_ok=True)
    return d


def split_repo_tag(repo_spec: str) -> tuple[str, str]:
    """"user/model:q4_k_m" → ("user/model", "q4_k_m"); default tag 'latest'
    (≡ common_download_split_repo_tag)."""
    if ":" in repo_spec.split("/")[-1]:
        repo, tag = repo_spec.rsplit(":", 1)
    else:
        repo, tag = repo_spec, "latest"
    return repo, tag


def clean_file_name(name: str) -> str:
    return re.sub(r"[^0-9A-Za-z._-]", "_", name)


def _request(url: str, headers: dict | None = None, method: str = "GET",
             opener=None):
    req = urllib.request.Request(url, headers=headers or {}, method=method)
    op = opener or urllib.request.build_opener()
    return op.open(req, timeout=30)


def resolve_hf_file(repo: str, tag: str, token: str | None = None,
                    endpoint: str | None = None, opener=None) -> str:
    """Quant tag → concrete GGUF path via the hub manifest API
    (≡ common_get_hf_file GET /v2/<repo>/manifests/<tag>)."""
    ep = endpoint or model_endpoint()
    url = f"{ep}v2/{repo}/manifests/{tag}"
    headers = {"User-Agent": "tpullm", "Accept": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    with _request(url, headers, opener=opener) as r:
        manifest = json.load(r)
    gguf = manifest.get("ggufFile") or {}
    rfilename = gguf.get("rfilename")
    if not rfilename:
        raise FileNotFoundError(
            f"no GGUF for tag {tag!r} in {repo!r} (manifest: "
            f"{sorted(manifest)})")
    return rfilename


def download_file(url: str, path: str, token: str | None = None,
                  offline: bool = False, opener=None) -> str:
    """Cached, resumable single-file download (≡ common_download_file_single).

    - `<path>.etag` sidecar decides freshness (If-None-Match revalidation)
    - partial data accumulates in `<path>.downloadInProgress`; a retry sends
      a Range header and accepts 206
    - the finished file is renamed into place atomically
    """
    etag_path = path + ".etag"
    part_path = path + ".downloadInProgress"
    have_etag = (open(etag_path).read().strip()
                 if os.path.exists(etag_path) else "")
    if offline:
        if os.path.exists(path):
            log(f"offline: using cached {path}")
            return path
        raise FileNotFoundError(f"offline mode and no cached copy: {path}")

    headers = {"User-Agent": "tpullm"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    if os.path.exists(path) and have_etag:
        headers["If-None-Match"] = have_etag
    resume_from = 0
    if os.path.exists(part_path):
        resume_from = os.path.getsize(part_path)
        headers["Range"] = f"bytes={resume_from}-"

    try:
        resp = _request(url, headers, opener=opener)
    except urllib.error.HTTPError as e:
        if e.code == 304:  # cached copy still fresh
            log(f"etag match, using cached {path}")
            return path
        if e.code == 416 and resume_from:  # partial already complete?
            os.replace(part_path, path)
            return path
        raise
    with resp:
        status = getattr(resp, "status", 200)
        if resume_from and status != 206:
            # server ignored the Range request — restart from scratch
            log(f"no 206 for resume (status {status}); restarting download")
            resume_from = 0
        mode = "ab" if resume_from else "wb"
        done = resume_from
        total = resume_from + int(resp.headers.get("Content-Length") or 0)
        with open(part_path, mode) as f:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                done += len(chunk)
                if total:
                    log(f"\r{os.path.basename(path)}: {done}/{total} bytes "
                        f"({100.0 * done / total:.0f}%)")
        etag = resp.headers.get("ETag", "")
    os.replace(part_path, path)
    if etag:
        with open(etag_path, "w") as f:
            f.write(etag)
    return path


_SPLIT_RE = re.compile(r"(.*)-(\d{5})-of-(\d{5})\.gguf$")


def split_siblings(rfilename: str) -> list[str]:
    """First-shard name → every shard name, else [rfilename]."""
    m = _SPLIT_RE.match(rfilename)
    if not m:
        return [rfilename]
    stem, _, n = m.groups()
    return [f"{stem}-{i:05d}-of-{n}.gguf" for i in range(1, int(n) + 1)]


def download_model(repo_spec: str, hf_file: str | None = None,
                   token: str | None = None, endpoint: str | None = None,
                   offline: bool = False, dest_dir: str | None = None,
                   opener=None) -> str:
    """-hf entry point: resolve + fetch (all shards); returns the local path
    of the (first) GGUF."""
    ep = endpoint or model_endpoint()
    repo, tag = split_repo_tag(repo_spec)
    if tag == "latest":
        tag = "default"  # hub convention (≡ arg.cpp:289)
    if hf_file is None:
        hf_file = resolve_hf_file(repo, tag, token, ep, opener=opener)
        log(f"resolved {repo_spec} -> {hf_file}")
    dest = dest_dir or cache_dir()
    first = None
    for shard in split_siblings(hf_file):
        url = f"{ep}{repo}/resolve/main/{shard}"
        path = os.path.join(dest, clean_file_name(f"{repo}_{shard}"))
        download_file(url, path, token, offline=offline, opener=opener)
        first = first or path
    return first


def add_hf_args(ap) -> None:
    """Attach the reference's -hf flag family to an argparse parser."""
    ap.add_argument("-hf", "--hf-repo", default=None,
                    metavar="<user>/<model>[:quant]",
                    help="download the model from a HF repo (≡ llama.cpp -hf)")
    ap.add_argument("-hff", "--hf-file", default=None,
                    help="explicit file inside --hf-repo")
    ap.add_argument("--hf-token", default=os.environ.get("HF_TOKEN"),
                    help="bearer token (default: HF_TOKEN env)")
    ap.add_argument("--offline", action="store_true",
                    help="never hit the network; use cached files only")


def model_path_from_args(args) -> str | None:
    """Resolve -hf flags to a local model path (None if not requested)."""
    repo = getattr(args, "hf_repo", None)
    if not repo:
        return None
    return download_model(repo, getattr(args, "hf_file", None),
                          getattr(args, "hf_token", None),
                          offline=getattr(args, "offline", False))
