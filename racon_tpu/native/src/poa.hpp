#pragma once

#include "common.hpp"

namespace rt {

struct LayerView {
    const uint8_t* data;
    const int32_t* weights;  // per-base weights (phred-33, or 1s)
    int64_t len;
    int32_t begin;  // inclusive backbone coords
    int32_t end;
    const OpRun* ops;  // precomputed alignment (nullptr -> align here)
    int64_t n_ops;
};

struct PoaScratch {
    std::vector<OpRun> ops;
    std::vector<uint8_t> moves;
    std::vector<int32_t> h_prev, h_cur;
};

// one window's consensus; returns consensus length written to out
int64_t consensus_window(
    const uint8_t* backbone, int32_t backbone_len, const int32_t* backbone_w,
    int64_t n_layers, const LayerView* layers, bool tgs, bool trim,
    int32_t match, int32_t mismatch, int32_t gap, uint8_t* out,
    int64_t out_capacity, bool* polished, int64_t window_id, int32_t rank,
    PoaScratch& scratch);

}  // namespace rt
