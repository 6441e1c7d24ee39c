// FASTA/FASTQ ingestion (plain or gzip, via zlib) into columnar blobs.
// Plays the reference's bioparser role (SURVEY.md sec 2.2) for sequence
// files; record semantics match racon_tpu/io/fastx.py:
//   name = header token up to first whitespace; bases uppercased;
//   all-'!' quality strings dropped (phred sum zero).

#include "fastx.hpp"

#include <zlib.h>

#include <cctype>

namespace rt {

bool read_entire_file(const char* path, std::string& out, std::string& err) {
    gzFile f = gzopen(path, "rb");
    if (!f) {
        err = "unable to open file ";
        err += path;
        return false;
    }
    gzbuffer(f, 1 << 20);
    out.clear();
    std::vector<char> buf(1 << 22);
    int n;
    while ((n = gzread(f, buf.data(), static_cast<unsigned>(buf.size()))) > 0) {
        out.append(buf.data(), n);
    }
    bool ok = (n == 0);
    if (!ok) err = std::string("error while reading ") + path;
    gzclose(f);
    return ok;
}

static inline const char* name_end(const char* p, const char* eol) {
    while (p < eol && *p != ' ' && *p != '\t' && *p != '\r') ++p;
    return p;
}

static inline void append_upper(std::string& dst, const char* p, const char* e) {
    for (; p < e; ++p) {
        char c = *p;
        if (c == '\r') continue;
        dst += static_cast<char>(toupper(static_cast<unsigned char>(c)));
    }
}

bool parse_fastx(const char* path, bool is_fastq, FastxResult& res,
                 std::string& err) {
    std::string raw;
    if (!read_entire_file(path, raw, err)) return false;
    const char* p = raw.data();
    const char* end = p + raw.size();
    res.name_off.push_back(0);
    res.data_off.push_back(0);
    res.qual_off.push_back(0);

    if (!is_fastq) {
        while (p < end && (*p == '\n' || *p == '\r')) ++p;
        if (p < end && *p != '>') {
            err = std::string("malformed FASTA file ") + path;
            return false;
        }
        while (p < end) {
            // at '>'
            const char* eol = static_cast<const char*>(
                memchr(p, '\n', end - p));
            if (!eol) eol = end;
            const char* ne = name_end(p + 1, eol);
            res.names.append(p + 1, ne - (p + 1));
            res.name_off.push_back(static_cast<int64_t>(res.names.size()));
            p = eol < end ? eol + 1 : end;
            while (p < end && *p != '>') {
                const char* l_eol = static_cast<const char*>(
                    memchr(p, '\n', end - p));
                if (!l_eol) l_eol = end;
                append_upper(res.data, p, l_eol);
                p = l_eol < end ? l_eol + 1 : end;
            }
            res.data_off.push_back(static_cast<int64_t>(res.data.size()));
            res.qual_off.push_back(static_cast<int64_t>(res.quals.size()));
        }
        return true;
    }

    // FASTQ (multi-line tolerant)
    while (p < end) {
        while (p < end && (*p == '\n' || *p == '\r')) ++p;
        if (p >= end) break;
        if (*p != '@') {
            err = std::string("malformed FASTQ file ") + path;
            return false;
        }
        const char* eol = static_cast<const char*>(memchr(p, '\n', end - p));
        if (!eol) eol = end;
        const char* ne = name_end(p + 1, eol);
        res.names.append(p + 1, ne - (p + 1));
        res.name_off.push_back(static_cast<int64_t>(res.names.size()));
        p = eol < end ? eol + 1 : end;
        const size_t data_start = res.data.size();
        while (p < end && *p != '+') {
            const char* l_eol = static_cast<const char*>(
                memchr(p, '\n', end - p));
            if (!l_eol) l_eol = end;
            append_upper(res.data, p, l_eol);
            p = l_eol < end ? l_eol + 1 : end;
        }
        // skip '+' line
        if (p < end) {
            const char* l_eol = static_cast<const char*>(
                memchr(p, '\n', end - p));
            p = l_eol ? l_eol + 1 : end;
        }
        const size_t dlen = res.data.size() - data_start;
        std::string q;
        q.reserve(dlen);
        while (p < end && q.size() < dlen) {
            const char* l_eol = static_cast<const char*>(
                memchr(p, '\n', end - p));
            if (!l_eol) l_eol = end;
            for (const char* c = p; c < l_eol; ++c) {
                if (*c != '\r') q += *c;
            }
            p = l_eol < end ? l_eol + 1 : end;
        }
        if (q.size() != dlen) {
            err = std::string("malformed FASTQ file ") + path;
            return false;
        }
        // drop all-'!' qualities
        bool nonzero = false;
        for (char c : q) {
            if (c != '!') {
                nonzero = true;
                break;
            }
        }
        if (nonzero) res.quals += q;
        res.data_off.push_back(static_cast<int64_t>(res.data.size()));
        res.qual_off.push_back(static_cast<int64_t>(res.quals.size()));
    }
    return true;
}

}  // namespace rt
