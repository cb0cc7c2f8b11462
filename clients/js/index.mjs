/**
 * muninn-tpu JavaScript client SDK (zero-dependency ESM).
 *
 * The reference ships its non-Python surface as an npm package whose
 * job is resolving/loading the engine and surfacing typed errors
 * (reference `npm/src/index.ts:46-85`, `getLoadablePath()`/`load(db)`);
 * for a served TPU engine the equivalent is this fetch-based HTTP
 * client — the JS twin of `muninn_tpu/client.py`, speaking the JSON
 * contract documented in `muninn_tpu/serve.py`.
 *
 * Runs on any runtime with a WHATWG `fetch` global (node >= 18, deno,
 * bun, browsers). No dependencies, no build step.
 *
 *     import { EngineClient } from "./index.mjs";
 *
 *     const c = new EngineClient("http://127.0.0.1:8800");
 *     const idx = await c.createIndex("docs", 384, { metric: "cosine", kind: "hnsw" });
 *     await idx.insert([1, 2], [[...], [...]]);
 *     const { ids, distances } = await idx.search([[...]], 10);
 *
 *     const g = await c.createGraph("kg", ["a", "b"], ["b", "c"]);
 *     const pr = await g.pagerank();
 *
 * Contract validation: this file cannot be *executed* in the build
 * image (no JS runtime — see ROADMAP.md), so `clients/js/fixtures.json`
 * pins the exact request bodies each method produces and
 * `tests/test_js_client_contract.py` replays them against a live
 * `EngineServer`, plus statically cross-checks every endpoint/field
 * in this source against the server's routing table.
 */

/** Base class for all client-side errors. */
export class MuninnClientError extends Error {
  constructor(message) {
    super(message);
    this.name = this.constructor.name;
  }
}

/** Server rejected the request (HTTP 4xx): bad params, unknown name. */
export class MuninnRequestError extends MuninnClientError {
  constructor(status, message) {
    super(`HTTP ${status}: ${message}`);
    this.status = status;
    this.detail = message;
  }
}

/** Server failed (HTTP 5xx) after exhausting retries. */
export class MuninnServerError extends MuninnClientError {
  constructor(status, message) {
    super(`HTTP ${status}: ${message}`);
    this.status = status;
    this.detail = message;
  }
}

/** Could not reach the server after exhausting retries. */
export class MuninnConnectionError extends MuninnClientError {}

const sleep = (ms) => new Promise((res) => setTimeout(res, ms));

/** Accept TypedArray / Array-of-TypedArray / nested arrays uniformly. */
function toList(x) {
  if (x == null) return x;
  if (ArrayBuffer.isView(x)) return Array.from(x);
  if (Array.isArray(x)) {
    return x.map((row) => (ArrayBuffer.isView(row) ? Array.from(row) : row));
  }
  return Array.from(x);
}

/** Strip null/undefined values (the server applies its own defaults). */
function compact(body) {
  const out = {};
  for (const [k, v] of Object.entries(body)) {
    if (v !== null && v !== undefined) out[k] = v;
  }
  return out;
}

/**
 * Connection handle to one muninn_tpu.serve.EngineServer.
 *
 * Retries connection failures and 5xx responses `retries` times with
 * exponential backoff — but ONLY on idempotent (read-only) paths: a
 * mutation retry can re-apply a request the server already committed
 * and then surface a spurious "duplicate id" failure (same rule as the
 * Python SDK, `client.py` `_IDEMPOTENT`). 4xx responses never retry.
 */
export class EngineClient {
  static IDEMPOTENT = [
    "/health",
    "/stats",
    "/index/search",
    "/index/list",
    "/graph/query",
    "/index/tune",
  ];

  constructor(baseUrl = "http://127.0.0.1:8800", opts = {}) {
    this.baseUrl = baseUrl.replace(/\/+$/, "");
    this.timeout = opts.timeout ?? 60.0; // seconds, like the Python SDK
    this.retries = opts.retries ?? 3;
    this.backoff = opts.backoff ?? 0.2; // seconds
  }

  async _request(path, body = null) {
    const url = this.baseUrl + path;
    const idempotent = EngineClient.IDEMPOTENT.some((p) => path.startsWith(p));
    const retries = idempotent ? this.retries : 0;
    let lastErr = null;
    for (let attempt = 0; attempt <= retries; attempt++) {
      let resp = null;
      try {
        resp = await fetch(url, {
          method: body === null ? "GET" : "POST",
          headers: { "Content-Type": "application/json" },
          body: body === null ? undefined : JSON.stringify(body),
          signal: AbortSignal.timeout(this.timeout * 1000),
        });
      } catch (e) {
        lastErr = new MuninnConnectionError(String(e));
      }
      if (resp !== null) {
        if (resp.ok) {
          try {
            return await resp.json();
          } catch (e) {
            // transport-corrupted 2xx: typed, retryable only here
            // (idempotent path) — the request may already be applied
            lastErr = new MuninnConnectionError("undecodable response body");
          }
        } else {
          let msg = resp.statusText;
          try {
            msg = (await resp.json()).error ?? msg;
          } catch (e) {
            /* keep statusText */
          }
          if (resp.status < 500) throw new MuninnRequestError(resp.status, msg);
          lastErr = new MuninnServerError(resp.status, msg);
        }
      }
      if (attempt < retries) await sleep(this.backoff * 1000 * 2 ** attempt);
    }
    throw lastErr;
  }

  async health() {
    return this._request("/health");
  }

  /** Server catalog + counters (index/graph rows, coalescer stats). */
  async stats() {
    return this._request("/stats");
  }

  /** One row per served index: {name, kind, dim, count}. */
  async listIndexes() {
    return (await this._request("/index/list")).indexes;
  }

  async ping() {
    try {
      return Boolean((await this.health()).ok);
    } catch (e) {
      if (e instanceof MuninnClientError) return false;
      throw e;
    }
  }

  /** Block until the server answers /health (for spawn-then-use). */
  async waitReady(timeout = 30.0, interval = 0.1) {
    const deadline = Date.now() + timeout * 1000;
    const probe = new EngineClient(this.baseUrl, {
      timeout: Math.max(Math.min(2.0, timeout), 0.1),
      retries: 0,
    });
    while (Date.now() < deadline) {
      if (await probe.ping()) return;
      await sleep(interval * 1000);
    }
    throw new MuninnConnectionError(
      `server at ${this.baseUrl} not ready within ${timeout}s`,
    );
  }

  /**
   * Create a served index. kind: "hnsw" | "flat" | "quantized" | "ivf".
   * Options mirror `client.py::create_index` (m/efConstruction for
   * hnsw; precision/projDim for flat; clusterSize/nprobe/rescoreR/quant
   * for ivf).
   */
  async createIndex(name, dim, opts = {}) {
    await this._request("/index/create", {
      name,
      dim,
      metric: opts.metric ?? "l2",
      kind: opts.kind ?? "hnsw",
      m: opts.m ?? 16,
      ef_construction: opts.efConstruction ?? 200,
      precision: opts.precision ?? "highest",
      proj_dim: opts.projDim ?? 128,
      cluster_size: opts.clusterSize ?? 128,
      nprobe: opts.nprobe ?? 8,
      rescore_r: opts.rescoreR ?? 32,
      quant: opts.quant ?? "bf16",
    });
    return new RemoteIndex(this, name);
  }

  /** Handle to an index that already exists on the server. */
  index(name) {
    return new RemoteIndex(this, name);
  }

  /** Restore a server-local checkpoint as a new served index. */
  async loadIndex(name, path) {
    await this._request("/index/load", { name, path });
    return new RemoteIndex(this, name);
  }

  async createGraph(name, src, dst, weights = null, opts = {}) {
    await this._request(
      "/graph/create",
      compact({
        name,
        src: toList(src),
        dst: toList(dst),
        weights: toList(weights),
        timestamps: toList(opts.timestamps),
        time_start: opts.timeStart,
        time_end: opts.timeEnd,
      }),
    );
    return new RemoteGraph(this, name);
  }

  graph(name) {
    return new RemoteGraph(this, name);
  }
}

/** Handle to a server-side vector index. */
export class RemoteIndex {
  constructor(client, name) {
    this._c = client;
    this.name = name;
  }

  async insert(ids, vectors) {
    const r = await this._c._request("/index/insert", {
      name: this.name,
      ids: toList(ids),
      vectors: toList(vectors),
    });
    return r.count;
  }

  /**
   * Returns `{ids, distances}` as nested arrays `[B][k]`. A single
   * query vector is auto-wrapped to a batch of one (and unwrapped in
   * the result). `efSearch` applies to hnsw indexes, `nprobe` to ivf.
   */
  async search(queries, k = 10, opts = {}) {
    let q = toList(queries);
    let single = false;
    if (q.length && !Array.isArray(q[0])) {
      single = true;
      q = [q];
    }
    const body = compact({
      name: this.name,
      queries: q,
      k,
      ef_search: opts.efSearch,
      nprobe: opts.nprobe,
    });
    const r = await this._c._request("/index/search", body);
    if (single) return { ids: r.ids[0], distances: r.distances[0] };
    return { ids: r.ids, distances: r.distances };
  }

  async delete(ids) {
    const r = await this._c._request("/index/delete", {
      name: this.name,
      ids: toList(ids),
    });
    return r.count;
  }

  /** Autotune the int8 retrieve width (flat int8_rescored indexes). */
  async tune(opts = {}) {
    const body = compact({
      name: this.name,
      k: opts.k ?? 10,
      target_recall: opts.targetRecall ?? 0.99,
      queries: toList(opts.queries),
    });
    const r = await this._c._request("/index/tune", body);
    return { r: r.r, curve: r.curve };
  }

  /** Checkpoint this index to a server-local directory. */
  async save(path) {
    const r = await this._c._request("/index/save", {
      name: this.name,
      path,
    });
    return r.path;
  }
}

/** Handle to a server-side graph. */
export class RemoteGraph {
  constructor(client, name) {
    this._c = client;
    this.name = name;
  }

  async _query(op, kw = {}) {
    const body = compact({ name: this.name, op, ...kw });
    return this._c._request("/graph/query", body);
  }

  async pagerank(damping = 0.85, iterations = 20) {
    return this._query("pagerank", { damping, iterations });
  }

  async components() {
    return this._query("components");
  }

  async bfs(start, opts = {}) {
    return this._query("bfs", {
      start,
      max_depth: opts.maxDepth,
      direction: opts.direction ?? "forward",
    });
  }

  async shortestPath(start, end, opts = {}) {
    return this._query("shortest_path", { start, end, weighted: opts.weighted });
  }

  async degree(opts = {}) {
    return this._query("degree", {
      direction: opts.direction ?? "both",
      weighted: opts.weighted ?? false,
      normalized: opts.normalized ?? false,
    });
  }

  async betweenness(opts = {}) {
    return this._query("betweenness", { normalized: opts.normalized ?? false });
  }

  async closeness(opts = {}) {
    return this._query("closeness", { normalized: opts.normalized ?? true });
  }

  async leiden(opts = {}) {
    return this._query("leiden", {
      resolution: opts.resolution ?? 1.0,
      seed: opts.seed ?? 0,
    });
  }

  async select(selector) {
    return this._query("select", { selector });
  }
}
