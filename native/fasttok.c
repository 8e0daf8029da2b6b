/* fasttok — native tokenize+hash hot loop for the hash tokenizer.
 *
 * Mirrors automative_rag_tpu/models/tokenizer.py exactly:
 *   - CJK chars (U+4E00..U+9FFF) are single tokens
 *   - latin letter runs, digit runs (with one optional '.<digits>' tail)
 *   - any other non-space char is a single token
 *   - token id = RESERVED + fnv1a64(lowercased utf-8 bytes) % (vocab - RESERVED)
 *
 * Exposed as a C ABI for ctypes; the Python fallback implements the same
 * algorithm, so outputs are bit-identical either way.
 *
 * Build: gcc -O3 -shared -fPIC -o libfasttok.so fasttok.c
 */

#include <stdint.h>
#include <stddef.h>

#define RESERVED 4u

static uint64_t fnv1a64(const unsigned char *data, size_t len) {
    uint64_t hash = 14695981039346656037ULL;
    for (size_t i = 0; i < len; i++) {
        hash ^= data[i];
        hash *= 1099511628211ULL;
    }
    return hash;
}

/* decode one UTF-8 codepoint; returns bytes consumed (0 on error) */
static int utf8_decode(const unsigned char *s, size_t len, uint32_t *cp) {
    if (len == 0) return 0;
    unsigned char c = s[0];
    if (c < 0x80) { *cp = c; return 1; }
    if ((c >> 5) == 0x6 && len >= 2) {
        *cp = ((c & 0x1F) << 6) | (s[1] & 0x3F);
        return 2;
    }
    if ((c >> 4) == 0xE && len >= 3) {
        *cp = ((c & 0x0F) << 12) | ((s[1] & 0x3F) << 6) | (s[2] & 0x3F);
        return 3;
    }
    if ((c >> 3) == 0x1E && len >= 4) {
        *cp = ((c & 0x07) << 18) | ((s[1] & 0x3F) << 12)
            | ((s[2] & 0x3F) << 6) | (s[3] & 0x3F);
        return 4;
    }
    *cp = c;
    return 1;
}

static int is_cjk(uint32_t cp) { return cp >= 0x4E00 && cp <= 0x9FFF; }
static int is_alpha(uint32_t cp) {
    return (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z');
}
static int is_digit(uint32_t cp) { return cp >= '0' && cp <= '9'; }
static int is_space(uint32_t cp) {
    return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r'
        || cp == 0x0B || cp == 0x0C;
}

static uint32_t hash_token(const unsigned char *tok, size_t len, uint32_t vocab) {
    /* lowercase ASCII in a stack buffer (tokens are short) */
    unsigned char buf[64];
    size_t n = len < sizeof(buf) ? len : sizeof(buf);
    for (size_t i = 0; i < n; i++) {
        unsigned char c = tok[i];
        buf[i] = (c >= 'A' && c <= 'Z') ? (unsigned char)(c + 32) : c;
    }
    return RESERVED + (uint32_t)(fnv1a64(buf, n) % (uint64_t)(vocab - RESERVED));
}

/* tokenize+hash text into out[0..max_tokens); returns token count */
int fasttok_encode(const unsigned char *text, size_t text_len,
                   uint32_t vocab_size, uint32_t *out, size_t max_tokens) {
    size_t pos = 0, count = 0;
    while (pos < text_len && count < max_tokens) {
        uint32_t cp;
        int used = utf8_decode(text + pos, text_len - pos, &cp);
        if (used <= 0) { pos++; continue; }
        if (is_space(cp)) { pos += (size_t)used; continue; }

        size_t start = pos;
        if (is_cjk(cp)) {
            pos += (size_t)used;  /* single CJK char token */
        } else if (is_alpha(cp)) {
            while (pos < text_len) {
                int u = utf8_decode(text + pos, text_len - pos, &cp);
                if (u <= 0 || !is_alpha(cp)) break;
                pos += (size_t)u;
            }
        } else if (is_digit(cp)) {
            while (pos < text_len) {
                int u = utf8_decode(text + pos, text_len - pos, &cp);
                if (u <= 0 || !is_digit(cp)) break;
                pos += (size_t)u;
            }
            /* optional .digits tail (e.g. 6.9) */
            if (pos + 1 < text_len && text[pos] == '.' ) {
                uint32_t nxt;
                int u = utf8_decode(text + pos + 1, text_len - pos - 1, &nxt);
                if (u > 0 && is_digit(nxt)) {
                    pos++;  /* consume '.' */
                    while (pos < text_len) {
                        int v = utf8_decode(text + pos, text_len - pos, &nxt);
                        if (v <= 0 || !is_digit(nxt)) break;
                        pos += (size_t)v;
                    }
                }
            }
        } else {
            pos += (size_t)used;  /* single punctuation/other token */
        }
        out[count++] = hash_token(text + start, pos - start, vocab_size);
    }
    return (int)count;
}
