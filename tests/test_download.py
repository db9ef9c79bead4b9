"""Model download (-hf) against a localhost hub: manifest resolution, etag
caching, Range resume, split shards (≡ common/download.cpp behavior)."""

import http.server
import json
import os
import threading

import pytest

from tpullm.tools.download import (
    download_file,
    download_model,
    resolve_hf_file,
    split_repo_tag,
    split_siblings,
)

PAYLOAD = os.urandom(1 << 16)


class _Hub(http.server.BaseHTTPRequestHandler):
    requests: list[str] = []

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):  # noqa: N802
        type(self).requests.append(
            f"{self.path} range={self.headers.get('Range')} "
            f"inm={self.headers.get('If-None-Match')}")
        if self.path.endswith("/manifests/q4_k_m"):
            body = json.dumps(
                {"ggufFile": {"rfilename": "model-Q4_K_M.gguf"}}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path.endswith(".gguf"):
            if self.headers.get("If-None-Match") == '"v1"':
                self.send_response(304)
                self.end_headers()
                return
            rng = self.headers.get("Range")
            data = PAYLOAD
            if rng:
                start = int(rng.split("=")[1].rstrip("-"))
                self.send_response(206)
                data = PAYLOAD[start:]
            else:
                self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("ETag", '"v1"')
            self.end_headers()
            self.wfile.write(data)
            return
        self.send_response(404)
        self.end_headers()


@pytest.fixture(scope="module")
def hub():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Hub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/"
    srv.shutdown()


def test_split_repo_tag():
    assert split_repo_tag("user/model:q4_k_m") == ("user/model", "q4_k_m")
    assert split_repo_tag("user/model") == ("user/model", "latest")


def test_split_siblings():
    assert split_siblings("m.gguf") == ["m.gguf"]
    assert split_siblings("m-00001-of-00003.gguf") == [
        "m-00001-of-00003.gguf", "m-00002-of-00003.gguf",
        "m-00003-of-00003.gguf"]


def test_resolve_manifest(hub):
    assert resolve_hf_file("user/model", "q4_k_m",
                           endpoint=hub) == "model-Q4_K_M.gguf"


def test_download_etag_and_revalidate(hub, tmp_path):
    url = hub + "user/model/resolve/main/model-Q4_K_M.gguf"
    path = str(tmp_path / "m.gguf")
    download_file(url, path)
    assert open(path, "rb").read() == PAYLOAD
    assert open(path + ".etag").read() == '"v1"'
    # second fetch revalidates via If-None-Match and keeps the cached copy
    mtime = os.path.getmtime(path)
    download_file(url, path)
    assert os.path.getmtime(path) == mtime
    assert open(path, "rb").read() == PAYLOAD


def test_download_resume(hub, tmp_path):
    url = hub + "user/model/resolve/main/model-Q4_K_M.gguf"
    path = str(tmp_path / "m.gguf")
    # simulate an interrupted download
    with open(path + ".downloadInProgress", "wb") as f:
        f.write(PAYLOAD[: 1 << 10])
    _Hub.requests.clear()
    download_file(url, path)
    assert open(path, "rb").read() == PAYLOAD
    assert any("range=bytes=1024-" in r for r in _Hub.requests)


def test_download_model_via_tag(hub, tmp_path):
    p = download_model("user/model:q4_k_m", endpoint=hub,
                       dest_dir=str(tmp_path))
    assert p.endswith("user_model_model-Q4_K_M.gguf")
    assert open(p, "rb").read() == PAYLOAD


def test_offline_uses_cache(hub, tmp_path):
    url = hub + "user/model/resolve/main/model-Q4_K_M.gguf"
    path = str(tmp_path / "m.gguf")
    download_file(url, path)
    assert download_file(url, path, offline=True) == path
    with pytest.raises(FileNotFoundError):
        download_file(url, str(tmp_path / "missing.gguf"), offline=True)
