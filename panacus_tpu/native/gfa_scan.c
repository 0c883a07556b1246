/* Native GFA path tokenizer: the host-side hot loop.
 *
 * Single-pass replacements for the reference's rayon byte-scanner
 * (reference: src/graph_broker/util.rs:963-1142): turn a P-line segment
 * string "12+,34-,..." or a W-line walk ">12<34..." into dense id and
 * orientation arrays at memory speed. Called via ctypes from
 * panacus_tpu/native/__init__.py; the numpy tokenizer remains as a
 * portable fallback.
 */

#include <stdint.h>
#include <stddef.h>

#define EXPORT __attribute__((visibility("default")))

/* Parse comma-separated integer tokens with a +/- orientation suffix.
 * Returns the token count, or -1 if a non-digit is found where a digit is
 * expected. ids/orient must hold at least len/2 + 1 entries. */
EXPORT int64_t pt_parse_path_pm(
    const uint8_t* s, int64_t len, int64_t* ids, uint8_t* orient)
{
    int64_t n = 0;
    int64_t i = 0;
    while (i < len) {
        int64_t v = 0;
        int any = 0;
        while (i < len) {
            uint8_t c = s[i];
            if (c >= '0' && c <= '9') {
                v = v * 10 + (c - '0');
                any = 1;
                i++;
            } else {
                break;
            }
        }
        if (!any) return -1;
        if (i >= len) return -1; /* missing orientation */
        uint8_t o = s[i];
        if (o == '+') {
            orient[n] = 0;
        } else if (o == '-') {
            orient[n] = 1;
        } else {
            return -1;
        }
        ids[n++] = v;
        i++;
        if (i < len) {
            if (s[i] != ',') return -1;
            i++;
        }
    }
    return n;
}

/* Parse a walk string of "><"-prefixed integer tokens. */
EXPORT int64_t pt_parse_walk_lg(
    const uint8_t* s, int64_t len, int64_t* ids, uint8_t* orient)
{
    int64_t n = 0;
    int64_t i = 0;
    while (i < len) {
        uint8_t o = s[i];
        if (o == '>') {
            orient[n] = 0;
        } else if (o == '<') {
            orient[n] = 1;
        } else {
            return -1;
        }
        i++;
        int64_t v = 0;
        int any = 0;
        while (i < len) {
            uint8_t c = s[i];
            if (c >= '0' && c <= '9') {
                v = v * 10 + (c - '0');
                any = 1;
                i++;
            } else {
                break;
            }
        }
        if (!any) return -1;
        ids[n++] = v;
    }
    return n;
}

/* Parse n decimal integers at byte spans [starts[i], ends[i]).
 * Returns 0, or -1 if any span is empty/non-digit/too long. */
EXPORT int64_t pt_parse_int_spans(
    const uint8_t* buf, const int64_t* starts, const int64_t* ends,
    int64_t n, int64_t* out)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t a = starts[i], b = ends[i];
        if (b <= a || b - a > 18) return -1;
        int64_t v = 0;
        for (int64_t j = a; j < b; j++) {
            uint8_t c = buf[j];
            if (c < '0' || c > '9') return -1;
            v = v * 10 + (c - '0');
        }
        out[i] = v;
    }
    return 0;
}

/* OR one group's bit into a membership-matrix row for every visited item,
 * skipping out-of-range ids; returns the bp sum over node_lens. */
EXPORT uint64_t pt_or_row_bplen(
    uint32_t* m_row, uint32_t bit, const int64_t* ids, int64_t n,
    const uint32_t* node_lens, int64_t n_items)
{
    uint64_t bp = 0;
    for (int64_t k = 0; k < n; k++) {
        int64_t id = ids[k];
        if (id >= 1 && id <= n_items) {
            m_row[id] |= bit;
            bp += node_lens[id];
        }
    }
    return bp;
}
