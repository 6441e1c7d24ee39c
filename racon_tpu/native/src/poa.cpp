// Star partial-order consensus -- the native production implementation of
// racon_tpu/ops/poa_host.py (see that module's docstring for the design and
// its relation to the reference's spoa engine). Layers arrive either as raw
// sequences (aligned here with nw_score_align) or with precomputed op lists
// (the TPU path: device banded-NW produces the alignments).

#include "poa.hpp"

#include <algorithm>

#include "align.hpp"

namespace rt {

namespace {

struct Node {
    uint8_t base;
    int32_t col;       // backbone column, -1 for insertion nodes
    int32_t slot;      // ordering slot (gap index for insertions)
    int32_t coverage;
};

struct Edge {
    int32_t tail;
    int32_t head;
    int64_t weight;
};

struct Graph {
    int32_t backbone_len;
    std::vector<Node> nodes;
    std::vector<Edge> edges;
    // per-node edge id lists in creation order (tie-breaking in the heaviest
    // bundle follows in-edge creation order, matching the python oracle)
    std::vector<std::vector<int32_t>> in_edges;
    std::vector<std::vector<int32_t>> out_edges;
    std::vector<std::vector<int32_t>> variants;   // per column: variant nodes
    // insertion nodes are column-aligned per gap: ins_levels[gap][depth] lists
    // nodes so identical inserted bases from different layers share one node
    // and votes concentrate (the role graph alignment plays in sequential POA)
    std::vector<std::vector<std::vector<int32_t>>> ins_levels;

    int32_t new_node(uint8_t base, int32_t col, int32_t slot) {
        nodes.push_back({base, col, slot, 0});
        in_edges.emplace_back();
        out_edges.emplace_back();
        return static_cast<int32_t>(nodes.size()) - 1;
    }

    void bump_edge(int32_t u, int32_t v, int64_t w) {
        for (int32_t e : out_edges[u]) {
            if (edges[e].head == v) {
                edges[e].weight += w;
                return;
            }
        }
        int32_t e = static_cast<int32_t>(edges.size());
        edges.push_back({u, v, w});
        in_edges[v].push_back(e);
        out_edges[u].push_back(e);
    }

    void init(const uint8_t* backbone, int32_t len, const int32_t* weights) {
        backbone_len = len;
        nodes.reserve(len * 2);
        variants.assign(len, {});
        ins_levels.assign(len + 1, {});
        for (int32_t c = 0; c < len; ++c) new_node(backbone[c], c, c);
        for (int32_t c = 0; c < len; ++c) {
            nodes[c].coverage += 1;
            if (c > 0) bump_edge(c - 1, c, int64_t(weights[c - 1]) + weights[c]);
        }
    }

    void add_path(const OpRun* ops, int64_t n_ops, int32_t t_offset,
                  const uint8_t* data, const int32_t* weights) {
        int32_t prev = -1;
        int64_t q = 0;
        int32_t t = t_offset;
        int32_t ins_depth = 0;  // consecutive insertions since last match/del
        for (int64_t k = 0; k < n_ops; ++k) {
            const int32_t op = ops[k].op;
            const int32_t run = ops[k].run;
            if (op != OP_INS) ins_depth = 0;
            if (op == OP_MATCH) {
                for (int32_t u = 0; u < run; ++u) {
                    const uint8_t b = data[q];
                    int32_t node;
                    if (nodes[t].base == b) {
                        node = t;
                    } else {
                        node = -1;
                        for (int32_t v : variants[t]) {
                            if (nodes[v].base == b) {
                                node = v;
                                break;
                            }
                        }
                        if (node < 0) {
                            node = new_node(b, t, t);
                            variants[t].push_back(node);
                        }
                    }
                    nodes[node].coverage += 1;
                    if (prev >= 0) {
                        bump_edge(prev, node,
                                  int64_t(weights[q - 1]) + weights[q]);
                    }
                    prev = node;
                    ++q;
                    ++t;
                }
            } else if (op == OP_INS) {
                for (int32_t u = 0; u < run; ++u) {
                    const uint8_t b = data[q];
                    const int32_t depth = ins_depth++;
                    auto& levels = ins_levels[t];
                    if (static_cast<int32_t>(levels.size()) <= depth) {
                        levels.resize(depth + 1);
                    }
                    int32_t node = -1;
                    for (int32_t v : levels[depth]) {
                        if (nodes[v].base == b) {
                            node = v;
                            break;
                        }
                    }
                    if (node < 0) {
                        node = new_node(b, -1, t);
                        levels[depth].push_back(node);
                    }
                    nodes[node].coverage += 1;
                    if (prev >= 0) {
                        bump_edge(prev, node,
                                  int64_t(weights[q - 1]) + weights[q]);
                    }
                    prev = node;
                    ++q;
                }
            } else {
                t += run;
            }
        }
    }

    // topological order: per slot, gap insertions then backbone node then its
    // variants (insertion creation order is ancestor-first)
    void rank_order(std::vector<int32_t>& rank) const {
        rank.clear();
        rank.reserve(nodes.size());
        for (int32_t c = 0; c < backbone_len; ++c) {
            for (const auto& level : ins_levels[c]) {
                for (int32_t v : level) rank.push_back(v);
            }
            rank.push_back(c);
            for (int32_t v : variants[c]) rank.push_back(v);
        }
        for (const auto& level : ins_levels[backbone_len]) {
            for (int32_t v : level) rank.push_back(v);
        }
    }

    // spoa-semantics heaviest bundle + branch completion; fills consensus node
    // path
    void heaviest_bundle(std::vector<int32_t>& path) const {
        const int64_t n = static_cast<int64_t>(nodes.size());
        std::vector<int32_t> rank;
        rank_order(rank);
        std::vector<int32_t> node_rank(n);
        for (int64_t r = 0; r < n; ++r) node_rank[rank[r]] = static_cast<int32_t>(r);
        std::vector<int64_t> scores(n, -1);
        std::vector<int32_t> pred(n, -1);

        int32_t best = -1;
        for (int64_t r = 0; r < n; ++r) {
            const int32_t v = rank[r];
            for (int32_t e : in_edges[v]) {
                const int32_t u = edges[e].tail;
                const int64_t w = edges[e].weight;
                if (scores[v] < w ||
                    (scores[v] == w && scores[pred[v]] <= scores[u])) {
                    scores[v] = w;
                    pred[v] = u;
                }
            }
            if (pred[v] >= 0) scores[v] += scores[pred[v]];
            if (best < 0 || scores[best] < scores[v]) best = v;
        }

        while (!out_edges[best].empty()) {
            // ban side-branch tails of the current tip, then rescore the
            // downstream ranks
            for (int32_t e : out_edges[best]) {
                const int32_t head = edges[e].head;
                for (int32_t e2 : in_edges[head]) {
                    if (edges[e2].tail != best) scores[edges[e2].tail] = -1;
                }
            }
            int64_t max_score = 0;
            int32_t max_node = -1;
            for (int64_t r = node_rank[best] + 1; r < n; ++r) {
                const int32_t v = rank[r];
                scores[v] = -1;
                pred[v] = -1;
                for (int32_t e : in_edges[v]) {
                    const int32_t u = edges[e].tail;
                    if (scores[u] == -1) continue;
                    const int64_t w = edges[e].weight;
                    if (scores[v] < w ||
                        (scores[v] == w && scores[pred[v]] <= scores[u])) {
                        scores[v] = w;
                        pred[v] = u;
                    }
                }
                if (pred[v] >= 0) scores[v] += scores[pred[v]];
                if (max_score < scores[v]) {
                    max_score = scores[v];
                    max_node = v;
                }
            }
            if (max_node < 0) break;
            best = max_node;
        }

        path.clear();
        for (int32_t v = best; v >= 0; v = pred[v]) path.push_back(v);
        std::reverse(path.begin(), path.end());
    }

    int64_t column_coverage(int32_t v) const {
        int64_t c = nodes[v].coverage;
        const int32_t col = nodes[v].col;
        if (col >= 0) {
            for (int32_t x : variants[col]) {
                if (x != v) c += nodes[x].coverage;
            }
            if (v != col) c += nodes[col].coverage;
        }
        return c;
    }
};

}  // namespace

int64_t consensus_window(
    const uint8_t* backbone, int32_t backbone_len, const int32_t* backbone_w,
    int64_t n_layers, const LayerView* layers, bool tgs, bool trim,
    int32_t match, int32_t mismatch, int32_t gap, uint8_t* out,
    int64_t out_capacity, bool* polished, int64_t window_id, int32_t rank,
    PoaScratch& scratch) {
    if (n_layers < 2) {
        // passthrough (reference: src/window.cpp:68-71)
        const int64_t n = std::min<int64_t>(backbone_len, out_capacity);
        memcpy(out, backbone, n);
        *polished = false;
        return n;
    }

    Graph g;
    g.init(backbone, backbone_len, backbone_w);

    const double offset = 0.01 * backbone_len;
    for (int64_t i = 0; i < n_layers; ++i) {
        const LayerView& L = layers[i];
        int32_t sub_begin = L.begin, sub_end = L.end;
        if (L.begin < offset && L.end > backbone_len - offset) {
            sub_begin = 0;
            sub_end = backbone_len - 1;
        }
        const OpRun* ops = L.ops;
        int64_t n_ops = L.n_ops;
        if (ops == nullptr) {
            nw_score_align(L.data, L.len, backbone + sub_begin,
                           sub_end - sub_begin + 1, match, mismatch, gap,
                           scratch.ops, scratch.moves, scratch.h_prev,
                           scratch.h_cur);
            ops = scratch.ops.data();
            n_ops = static_cast<int64_t>(scratch.ops.size());
        }
        g.add_path(ops, n_ops, sub_begin, L.data, L.weights);
    }

    std::vector<int32_t> path;
    g.heaviest_bundle(path);

    int64_t begin = 0;
    int64_t end = static_cast<int64_t>(path.size()) - 1;
    if (tgs && trim) {
        const int64_t average = n_layers / 2;
        while (begin < static_cast<int64_t>(path.size()) &&
               g.column_coverage(path[begin]) < average) {
            ++begin;
        }
        while (end >= 0 && g.column_coverage(path[end]) < average) {
            --end;
        }
        if (begin >= end) {
            fprintf(stderr,
                    "[racon::Window::generate_consensus] warning: contig %lld "
                    "might be chimeric in window %d!\n",
                    static_cast<long long>(window_id), rank);
            begin = 0;
            end = static_cast<int64_t>(path.size()) - 1;
        }
    }

    int64_t n = 0;
    for (int64_t i = begin; i <= end && n < out_capacity; ++i) {
        out[n++] = g.nodes[path[i]].base;
    }
    *polished = true;
    return n;
}

}  // namespace rt
