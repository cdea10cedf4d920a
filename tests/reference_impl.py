"""Trusted pure-Python/numpy reference implementations (the test oracle).

These mirror the documented operator semantics (SURVEY.md §2) in plain
dict/numpy code over small collected inputs. The Spark engine is correct
iff it matches these on the fixtures — PageRank allclose 1e-6,
component/label ids exact, risk scores exact (deterministic semantics).
"""

from __future__ import annotations

from collections import Counter, defaultdict


# ---------------------------------------------------------------------------
# edge derivation (contact matching analog)
# ---------------------------------------------------------------------------

def derive_contacts_py(rows, duration_threshold_s=900, session_gap_s=1800):
    """rows: iterable of (conv_id, turn_idx, role, ts_epoch_s).
    Returns {(src, dst): [(start_s, duration_ms), ...]} with src < dst."""
    convs = defaultdict(list)
    for conv_id, turn_idx, role, ts in rows:
        convs[conv_id].append((ts, turn_idx, role))

    contacts = defaultdict(set)
    for conv_id, turns in convs.items():
        turns.sort()
        # sessionize: gap > session_gap_s starts a new session
        session = 0
        prev_ts = None
        spans = defaultdict(lambda: [None, None])  # (session, role) -> [min, max]
        for ts, _, role in turns:
            if prev_ts is not None and ts - prev_ts > session_gap_s:
                session += 1
            prev_ts = ts
            key = (session, role)
            lo, hi = spans[key]
            spans[key] = [ts if lo is None else min(lo, ts), ts if hi is None else max(hi, ts)]
        by_session = defaultdict(list)
        for (session, role), (lo, hi) in spans.items():
            by_session[session].append((role, lo, hi))
        for session, actors in by_session.items():
            actors.sort()
            for i in range(len(actors)):
                for j in range(i + 1, len(actors)):
                    ra, la, ha = actors[i]
                    rb, lb, hb = actors[j]
                    start, end = max(la, lb), min(ha, hb)
                    if end - start >= duration_threshold_s:
                        contacts[(ra, rb)].add((start, (end - start) * 1000))
    return {k: sorted(v) for k, v in contacts.items()}


# ---------------------------------------------------------------------------
# graph algorithms over an undirected edge list of hashable vertex ids
# ---------------------------------------------------------------------------

def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def pagerank_py(edges, vertices, damping=0.85, tol=1e-9, max_iters=100):
    """Synchronous damped PageRank on the undirected graph (each undirected
    edge = two directed edges), dangling mass redistributed uniformly.
    Matches algorithms/pagerank.py update exactly."""
    adj = _adj(edges)
    verts = sorted(vertices)
    n = len(verts)
    rank = {v: 1.0 / n for v in verts}
    for _ in range(max_iters):
        contrib = defaultdict(float)
        dangling = 0.0
        for v in verts:
            nbrs = adj.get(v, ())
            if not nbrs:
                dangling += rank[v]
                continue
            share = rank[v] / len(nbrs)
            for u in nbrs:
                contrib[u] += share
        new = {
            v: (1 - damping) / n + damping * (contrib.get(v, 0.0) + dangling / n)
            for v in verts
        }
        l1 = sum(abs(new[v] - rank[v]) for v in verts)
        rank = new
        if l1 < tol:
            break
    return rank


def cc_py(edges, vertices):
    """Min-label propagation fixed point = min vertex id per component."""
    adj = _adj(edges)
    comp = {v: v for v in vertices}
    changed = True
    while changed:
        changed = False
        for v in vertices:
            m = min([comp[v]] + [comp[u] for u in adj.get(v, ())])
            if m != comp[v]:
                comp[v] = m
                changed = True
    return comp


def lpa_py(edges, vertices, max_iters=5):
    """Synchronous LPA, mode of neighbor labels, tie-break (count desc,
    label asc); vertices with no neighbors keep their label. Matches
    algorithms/label_propagation.py superstep-for-superstep."""
    adj = _adj(edges)
    label = {v: v for v in vertices}
    for _ in range(max_iters):
        new = {}
        any_change = False
        for v in vertices:
            nbrs = adj.get(v, ())
            if not nbrs:
                new[v] = label[v]
                continue
            counts = Counter(label[u] for u in nbrs)
            best = max(counts.items(), key=lambda kv: (kv[1], -_as_sortable(kv[0])))
            new[v] = best[0]
            any_change |= new[v] != label[v]
        label = new
        if not any_change:
            break
    return label


def _as_sortable(x):
    return x if isinstance(x, (int, float)) else int.from_bytes(str(x).encode(), "big")


def triangles_py(edges):
    """Exact triangle enumeration. Returns (total, {vertex: count})."""
    adj = _adj(edges)
    canon = {(min(u, v), max(u, v)) for u, v in edges}
    per = Counter()
    total = 0
    for a, b in sorted(canon):
        common = adj[a] & adj[b]
        for c in common:
            if c > b:  # count each triangle once: a < b < c
                total += 1
                per[a] += 1
                per[b] += 1
                per[c] += 1
    return total, dict(per)


# ---------------------------------------------------------------------------
# risk propagation (the reference BP semantics, deterministic variant)
# ---------------------------------------------------------------------------

def risk_prop_py(
    contacts,
    scores,
    transmission_rate=1.0,
    tolerance=1e-5,
    max_iters=5,
):
    """contacts: {(src,dst): [(start_s, duration_ms), ...]};
    scores: {actor: [(update_s, value), ...]}.
    Score element = (update_time_s, value, origin_id); natural order is the
    tuple order (RiskScore order, AbstractRiskScore.java:57-67).
    Returns final state {actor: set of score tuples} and the output top-1
    per actor under the OUTPUT comparator (value, update_time, id)."""
    edges = []  # (u, v, cutoff_s)
    for (s, d), occs in contacts.items():
        cutoff = max(start for start, _ in occs)
        edges.append((s, d, cutoff))
        edges.append((d, s, cutoff))

    state = {
        a: {(ut, val, a) for ut, val in hist} for a, hist in scores.items()
    }
    for _ in range(max_iters):
        incoming = defaultdict(set)
        for u, v, cutoff in edges:
            cand = [s for s in state.get(u, ()) if s[2] != v and s[0] < cutoff]
            if cand:
                ut, val, origin = max(cand)
                incoming[v].add((ut, val * transmission_rate, origin))
        l1 = 0.0
        for v, inc in incoming.items():
            old_max = max(state[v]) if state.get(v) else None
            l1 += abs(max(inc)[1] - (old_max[1] if old_max else 0.0))
            state.setdefault(v, set()).update(inc)
        if l1 < tolerance:
            break

    out = {}
    for a, ss in state.items():
        best = max(ss, key=lambda s: (s[1], s[0], s[2]))
        out[a] = (best[1], best[0])  # (value, update_time_s)
    return state, out


def bfs_py(edges, vertices, sources):
    """Plain BFS hop distance from a source set over the undirected graph
    (edges given canonical src<dst; both directions walked). Unreached
    vertices are absent from the result."""
    from collections import deque

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources if s in set(vertices)}
    dq = deque(dist)
    while dq:
        v = dq.popleft()
        for u in adj.get(v, ()):
            if u not in dist:
                dist[u] = dist[v] + 1
                dq.append(u)
    return dist


def ppr_weighted_py(wedges, vertices, seeds, damping=0.85, iters=5):
    """Weighted personalized PageRank, synchronous, fixed iteration count.
    ``wedges``: iterable of DIRECTED (src, dst, w) with w > 0. Restart and
    dangling mass return uniformly to ``seeds``; the walk starts there.
    Matches algorithms/pagerank.py with weight_col + teleport
    superstep-for-superstep."""
    out_w = defaultdict(float)
    adj = defaultdict(list)
    for u, v, w in wedges:
        out_w[u] += w
        adj[u].append((v, w))
    verts = sorted(vertices)
    pref = {v: (1.0 / len(seeds) if v in set(seeds) else 0.0) for v in verts}
    rank = dict(pref)
    for _ in range(iters):
        contrib = defaultdict(float)
        dangling = 0.0
        for v in verts:
            if not adj.get(v):
                dangling += rank[v]
                continue
            for u, w in adj[v]:
                contrib[u] += rank[v] * w / out_w[v]
        rank = {
            v: (1 - damping) * pref[v]
            + damping * (contrib.get(v, 0.0) + dangling * pref[v])
            for v in verts
        }
    return rank


def k_core_py(edges, vertices, k):
    """Iterative peeling: the set of vertices in the k-core."""
    adj = _adj(edges)
    alive = set(vertices)
    while True:
        dead = {v for v in alive
                if sum(1 for u in adj.get(v, ()) if u in alive) < k}
        if not dead:
            return alive
        alive -= dead


def lpa_weighted_py(wedges, vertices, max_iters=5):
    """Synchronous weighted LPA: adopt the label with the largest sum of
    incident edge weights, tie-break (sum desc, label asc). ``wedges``:
    DIRECTED (src, dst, w). Matches label_propagation(weight_col=...)."""
    inc = defaultdict(list)
    for u, v, w in wedges:
        inc[v].append((u, w))
    verts = sorted(vertices)
    label = {v: v for v in verts}
    for _ in range(max_iters):
        new = {}
        for v in verts:
            votes = defaultdict(int)
            for u, w in inc.get(v, ()):
                votes[label[u]] += w
            if votes:
                new[v] = min(votes, key=lambda l: (-votes[l], l))
            else:
                new[v] = label[v]
        label = new
    return label


def sssp_py(wedges, vertices, sources):
    """Dijkstra over DIRECTED (src, dst, w) with positive integer weights.
    Unreached vertices are absent from the result."""
    import heapq

    adj = defaultdict(list)
    for u, v, w in wedges:
        adj[u].append((v, w))
    dist = {}
    heap = [(0, s) for s in sources if s in set(vertices)]
    while heap:
        d, v = heapq.heappop(heap)
        if v in dist:
            continue
        dist[v] = d
        for u, w in adj[v]:
            if u not in dist:
                heapq.heappush(heap, (d + w, u))
    return dist


def k_truss_py(edges, k, max_iters=30):
    """Synchronous edge peeling: drop edges with < k-2 triangles among the
    surviving set, all at once per round, up to max_iters rounds (the
    engine's max_supersteps). Returns the surviving canonical edge set."""
    alive = {(min(u, v), max(u, v)) for u, v in edges}
    for _ in range(max_iters):
        adj = defaultdict(set)
        for u, v in alive:
            adj[u].add(v)
            adj[v].add(u)
        sup = {(u, v): len(adj[u] & adj[v]) for u, v in alive}
        nxt = {e for e in alive if sup[e] >= k - 2}
        if nxt == alive:
            break
        alive = nxt
    return alive


def random_walks_py(edges, num_walks, walk_length, seed="rw"):
    """Deterministic keyed-hash walks: at step k the walk at cur moves to
    the neighbor minimizing (md5(seed|start|widx|k|nbr), nbr). Returns
    {(start, widx): [start, v1, ..., v_walk_length]}."""
    import hashlib

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    walks = {}
    for start in sorted(adj):
        for w in range(num_walks):
            path, cur = [start], start
            for k in range(walk_length):
                cur = min(
                    adj[cur],
                    key=lambda n: (
                        hashlib.md5(
                            f"{seed}|{start}|{w}|{k}|{n}".encode()
                        ).hexdigest(),
                        n,
                    ),
                )
                path.append(cur)
            walks[(start, w)] = path
    return walks


def neighborhood_py(edges, max_radius):
    """Engine-mirroring neighborhood function: synchronous ball unions up
    to max_radius rounds, halting early after one no-growth round; the
    hist is then padded to max_radius+1 entries by repeating the saturated
    count (NF is constant past saturation), matching the engine's
    structural always-max_radius+1 contract.
    Returns {vertex: [NF(v, 0), ..., NF(v, max_radius)]}."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    balls = {v: {v} for v in adj}
    hist = {v: [1] for v in adj}
    for _ in range(max_radius):
        new = {v: balls[v] | set().union(*(balls[u] for u in adj[v]))
               for v in adj}
        grew = any(len(new[v]) > len(balls[v]) for v in adj)
        balls = new
        for v in adj:
            hist[v].append(len(balls[v]))
        if not grew:
            break
    for v in adj:
        hist[v] += [hist[v][-1]] * (max_radius + 1 - len(hist[v]))
    return hist


def squares_py(edges):
    """Brute-force exact 4-cycle count: λ(u,w) = common-neighbor count per
    unordered pair, Σ C(λ,2) / 2 (each cycle seen from both diagonals) —
    deliberately a DIFFERENT formula than the engine's L/M orientation
    decomposition (algorithms/squares.py)."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    vs = sorted(adj)
    total = 0
    for i, u in enumerate(vs):
        for w in vs[i + 1:]:
            lam = len(adj[u] & adj[w])
            total += lam * (lam - 1) // 2
    return total // 2
