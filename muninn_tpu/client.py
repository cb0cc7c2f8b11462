"""Python client SDK for the muninn-tpu HTTP serving layer.

The reference ships client bindings as an npm package whose job is
resolving + loading the engine and surfacing typed errors
(``npm/src/index.ts:46-85``); for a served TPU engine the equivalent is
a small HTTP client with retries, typed errors, and object-style
handles. Stdlib only — no dependencies.

    from muninn_tpu.client import EngineClient

    with EngineClient("http://127.0.0.1:8800") as c:
        idx = c.create_index("docs", dim=384, metric="cosine", kind="hnsw")
        idx.insert(ids, vectors)
        ids, dists = idx.search(queries, k=10)

        g = c.create_graph("kg", src=["a", "b"], dst=["b", "c"])
        pr = g.pagerank()
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Iterable, Sequence


class MuninnClientError(Exception):
    """Base class for all client-side errors."""


class MuninnRequestError(MuninnClientError):
    """Server rejected the request (HTTP 4xx): bad params, unknown name."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


class MuninnServerError(MuninnClientError):
    """Server failed (HTTP 5xx) after exhausting retries."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


class MuninnConnectionError(MuninnClientError):
    """Could not reach the server after exhausting retries."""


def _tolist(x) -> list:
    """Accept numpy arrays, sequences, or nested lists uniformly."""
    if hasattr(x, "tolist"):
        return x.tolist()
    return list(x)


class EngineClient:
    """Connection handle to one :class:`muninn_tpu.serve.EngineServer`.

    Retries connection failures and 5xx responses ``retries`` times with
    exponential backoff (4xx responses are never retried — they are
    deterministic rejections).
    """

    def __init__(
        self,
        base_url: str = "http://127.0.0.1:8800",
        *,
        timeout: float = 60.0,
        retries: int = 3,
        backoff: float = 0.2,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.retries = retries
        self.backoff = backoff

    # ── transport ──

    #: read-only endpoints, safe to re-send after a timeout/5xx. A
    #: mutation retry can re-apply a request the server already ran
    #: (e.g. a slow insert that committed after the client timed out)
    #: and then surface a spurious 'duplicate id' failure.
    _IDEMPOTENT = ("/health", "/stats", "/index/search", "/index/list",
                   "/graph/query", "/index/tune")

    def _request(self, path: str, body: dict | None = None) -> Any:
        url = self.base_url + path
        data = None if body is None else json.dumps(body).encode()
        retries = self.retries if path.startswith(self._IDEMPOTENT) else 0
        last_exc: Exception | None = None
        for attempt in range(retries + 1):
            req = urllib.request.Request(
                url, data=data,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    payload = r.read()
                try:
                    return json.loads(payload)
                except ValueError:
                    # transport-corrupted 2xx (broken proxy/middlebox):
                    # typed, and retryable only on idempotent paths —
                    # the request may already have been applied
                    last_exc = MuninnConnectionError(
                        "undecodable response body")
            except urllib.error.HTTPError as e:
                try:
                    msg = json.loads(e.read()).get("error", "")
                except Exception:
                    msg = e.reason
                if e.code < 500:
                    raise MuninnRequestError(e.code, msg) from None
                last_exc = MuninnServerError(e.code, msg)
            except (urllib.error.URLError, OSError, TimeoutError) as e:
                last_exc = MuninnConnectionError(str(e))
            if attempt < retries:
                time.sleep(self.backoff * (2 ** attempt))
        raise last_exc  # type: ignore[misc]

    # ── lifecycle ──

    def __enter__(self) -> "EngineClient":
        return self

    def __exit__(self, *exc) -> None:
        pass

    def health(self) -> dict:
        return self._request("/health")

    def stats(self) -> dict:
        """Server catalog + counters: index rows (name/kind/dim/count),
        graph rows (name/nodes/edges), coalescer counters."""
        return self._request("/stats")

    def list_indexes(self) -> list:
        """One row per served index: {name, kind, dim, count}."""
        return self._request("/index/list")["indexes"]

    def ping(self) -> bool:
        try:
            return bool(self.health().get("ok"))
        except MuninnClientError:
            return False

    def wait_ready(self, timeout: float = 30.0, interval: float = 0.1) -> None:
        """Block until the server answers /health (for spawn-then-use).

        Each probe uses a short per-request timeout and NO internal
        retries, so the deadline is honored — a hung connect would
        otherwise pin one ping() for the full request timeout x retry
        schedule (minutes past the caller's deadline)."""
        deadline = time.monotonic() + timeout
        probe = EngineClient(
            self.base_url,
            timeout=max(min(2.0, timeout), 0.1),
            retries=0,
        )
        while time.monotonic() < deadline:
            if probe.ping():
                return
            time.sleep(interval)
        raise MuninnConnectionError(
            f"server at {self.base_url} not ready within {timeout}s")

    # ── index surface ──

    def create_index(
        self,
        name: str,
        dim: int,
        *,
        metric: str = "l2",
        kind: str = "hnsw",          # "hnsw" | "flat" | "quantized" | "ivf"
        m: int = 16,
        ef_construction: int = 200,
        precision: str = "highest",  # flat only
        proj_dim: int = 128,         # flat proj_rescored only
        cluster_size: int = 128,     # ivf only
        nprobe: int = 8,             # ivf only
        rescore_r: int = 32,         # ivf only
        quant: str = "bf16",         # ivf only: "bf16" | "int8"
    ) -> "RemoteIndex":
        self._request("/index/create", {
            "name": name, "dim": dim, "metric": metric, "kind": kind,
            "m": m, "ef_construction": ef_construction,
            "precision": precision, "proj_dim": proj_dim,
            "cluster_size": cluster_size,
            "nprobe": nprobe, "rescore_r": rescore_r, "quant": quant,
        })
        return RemoteIndex(self, name)

    def index(self, name: str) -> "RemoteIndex":
        """Handle to an index that already exists on the server."""
        return RemoteIndex(self, name)

    def load_index(self, name: str, path: str) -> "RemoteIndex":
        """Restore a server-local checkpoint as a new served index
        (kind read from the manifest)."""
        self._request("/index/load", {"name": name, "path": path})
        return RemoteIndex(self, name)

    # ── graph surface ──

    def create_graph(
        self,
        name: str,
        src: Sequence,
        dst: Sequence,
        weights: Sequence[float] | None = None,
        *,
        timestamps: Sequence[float] | None = None,
        time_start: float | None = None,
        time_end: float | None = None,
    ) -> "RemoteGraph":
        body = {"name": name, "src": _tolist(src), "dst": _tolist(dst)}
        if weights is not None:
            body["weights"] = _tolist(weights)
        if timestamps is not None:
            body["timestamps"] = _tolist(timestamps)
        if time_start is not None:
            body["time_start"] = time_start
        if time_end is not None:
            body["time_end"] = time_end
        self._request("/graph/create", body)
        return RemoteGraph(self, name)

    def graph(self, name: str) -> "RemoteGraph":
        return RemoteGraph(self, name)


class RemoteIndex:
    """Handle to a server-side vector index (flat or HNSW)."""

    def __init__(self, client: EngineClient, name: str):
        self._c = client
        self.name = name

    def insert(self, ids: Iterable[int], vectors) -> int:
        r = self._c._request("/index/insert", {
            "name": self.name, "ids": _tolist(ids),
            "vectors": _tolist(vectors),
        })
        return r["count"]

    def search(self, queries, k: int = 10, *, ef_search: int | None = None,
               nprobe: int | None = None):
        """Returns ``(ids, distances)`` as nested lists ``[B][k]``.

        A single query vector is auto-wrapped to a batch of one.
        ``ef_search`` applies to hnsw indexes, ``nprobe`` to ivf.
        """
        q = _tolist(queries)
        single = False
        if q and not isinstance(q[0], (list, tuple)):
            if hasattr(q[0], "tolist"):
                # a python list OF numpy row vectors: a batch, not one
                # query (and raw ndarrays would fail json serialization)
                q = [_tolist(row) for row in q]
            else:
                single = True
                q = [q]
        body = {"name": self.name, "queries": q, "k": k}
        if ef_search is not None:
            body["ef_search"] = ef_search
        if nprobe is not None:
            body["nprobe"] = nprobe
        r = self._c._request("/index/search", body)
        if single:
            return r["ids"][0], r["distances"][0]
        return r["ids"], r["distances"]

    def delete(self, ids: Iterable[int]) -> int:
        r = self._c._request("/index/delete",
                             {"name": self.name, "ids": _tolist(ids)})
        return r["count"]

    def tune(self, queries=None, k: int = 10,
             target_recall: float = 0.99) -> dict:
        """Autotune the int8 retrieve width (flat ``int8_rescored``
        indexes): returns ``{"r": int, "curve": {r: recall}}``."""
        body = {"name": self.name, "k": k, "target_recall": target_recall}
        if queries is not None:
            body["queries"] = _tolist(queries)
        r = self._c._request("/index/tune", body)
        return {"r": r["r"], "curve": {int(k_): v for k_, v in r["curve"].items()}}

    def save(self, path: str) -> str:
        """Checkpoint this index to a server-local directory."""
        r = self._c._request("/index/save",
                             {"name": self.name, "path": path})
        return r["path"]


class RemoteGraph:
    """Handle to a server-side graph."""

    def __init__(self, client: EngineClient, name: str):
        self._c = client
        self.name = name

    def _query(self, op: str, **kw) -> Any:
        body = {"name": self.name, "op": op}
        body.update({k: v for k, v in kw.items() if v is not None})
        return self._c._request("/graph/query", body)

    def pagerank(self, damping: float = 0.85, iterations: int = 20) -> dict:
        return self._query("pagerank", damping=damping, iterations=iterations)

    def components(self) -> dict:
        return self._query("components")

    def bfs(self, start, max_depth: int | None = None,
            direction: str = "forward") -> list:
        return self._query("bfs", start=start, max_depth=max_depth,
                           direction=direction)

    def shortest_path(self, start, end, weighted: bool | None = None) -> dict:
        return self._query("shortest_path", start=start, end=end,
                           weighted=weighted)

    def degree(self, direction: str = "both", weighted: bool = False,
               normalized: bool = False) -> dict:
        return self._query("degree", direction=direction, weighted=weighted,
                           normalized=normalized)

    def betweenness(self, normalized: bool = False) -> dict:
        return self._query("betweenness", normalized=normalized)

    def closeness(self, normalized: bool = True) -> dict:
        return self._query("closeness", normalized=normalized)

    def leiden(self, resolution: float = 1.0, seed: int = 0) -> dict:
        return self._query("leiden", resolution=resolution, seed=seed)

    def select(self, selector: str) -> list:
        return self._query("select", selector=selector)
