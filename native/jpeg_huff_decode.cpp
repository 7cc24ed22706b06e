// JPEG entropy DECODER: the host half of device-side JPEG decoding.
//
// Parses a JFIF/Adobe stream (baseline SOF0 and progressive SOF2, 8-bit,
// 3 components, Huffman) down to quantized zigzag DCT coefficient planes
// padded to the MCU grid — the ~5-20x-smaller-than-pixels representation
// that then ships to the accelerator, where dequantization, the inverse
// DCT, and chroma upsampling run as one fused program
// (kernels/jpeg_enc.build_jpeg_decode).  Implemented from ITU T.81
// sections F.2 (sequential) and G.2 (progressive, spectral selection +
// successive approximation), including restart markers and EOB runs.
//
// Role parity: the reference decodes candidates entirely on host
// (jpeg-decoder crate, src/decode.rs:41-98; codec adapters' decode_fn);
// here the host stops at entropy decoding so candidate pixels never
// transit host RAM.

#include <cstdint>
#include <cstring>

namespace {

struct HuffDecodeTable {
    // Canonical decode: per code length l (1..16), the smallest and
    // largest code values and the index of the first symbol.
    int32_t mincode[17];
    int32_t maxcode[18];
    int32_t valptr[17];
    uint8_t huffval[256];
    bool present = false;

    void build(const uint8_t* bits /*[1..16]*/, const uint8_t* vals, int nvals) {
        int code = 0, k = 0;
        for (int l = 1; l <= 16; ++l) {
            valptr[l] = k;
            mincode[l] = code;
            code += bits[l];
            k += bits[l];
            maxcode[l] = code - 1;
            if (bits[l] == 0) maxcode[l] = -1;
            code <<= 1;
        }
        maxcode[17] = 0x7FFFFFFF;
        std::memcpy(huffval, vals, size_t(nvals < 256 ? nvals : 256));
        present = true;
    }
};

struct BitReader {
    const uint8_t* data;
    size_t len;
    size_t pos;
    uint32_t bitbuf = 0;
    int nbits = 0;
    bool marker_hit = false;  // stopped at a non-stuffing marker
    uint8_t marker = 0;
    bool error = false;

    // Returns the next entropy byte, handling FF00 stuffing; on a real
    // marker, sets marker_hit and feeds zero bits (T.81 F.2.2.5 treats
    // the marker as terminating the segment).
    void fill() {
        while (nbits <= 24) {
            if (marker_hit || pos >= len) {
                bitbuf = (bitbuf << 8);
                nbits += 8;
                continue;
            }
            uint8_t b = data[pos];
            if (b == 0xFF) {
                if (pos + 1 < len && data[pos + 1] == 0x00) {
                    pos += 2;
                } else {
                    marker_hit = true;
                    marker = pos + 1 < len ? data[pos + 1] : 0xD9;
                    bitbuf = (bitbuf << 8);
                    nbits += 8;
                    continue;
                }
            } else {
                ++pos;
            }
            bitbuf = (bitbuf << 8) | b;
            nbits += 8;
        }
    }

    int get_bits(int n) {
        if (n == 0) return 0;
        if (n > 24) {  // magnitude categories from a hostile DHT: UB shifts
            error = true;
            return 0;
        }
        if (nbits < n) fill();
        int v = int((bitbuf >> (nbits - n)) & ((1u << n) - 1u));
        nbits -= n;
        return v;
    }

    int get_bit() { return get_bits(1); }

    int decode(const HuffDecodeTable& t) {
        if (!t.present) { error = true; return 0; }
        if (nbits < 16) fill();
        int code = get_bit();
        int l = 1;
        while (code > t.maxcode[l]) {
            code = (code << 1) | get_bit();
            if (++l > 16) { error = true; return 0; }
        }
        return t.huffval[t.valptr[l] + (code - t.mincode[l])];
    }

    // Align to a byte boundary and consume an RST marker if present.
    bool sync_restart() {
        nbits = 0;
        bitbuf = 0;
        if (marker_hit) {
            if (marker >= 0xD0 && marker <= 0xD7) {
                pos += 2;  // we stopped AT the 0xFF
                marker_hit = false;
                return true;
            }
            return false;
        }
        // scan forward to the marker
        while (pos + 1 < len) {
            if (data[pos] == 0xFF && data[pos + 1] != 0x00) {
                if (data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7) {
                    pos += 2;
                    return true;
                }
                return false;
            }
            ++pos;
        }
        return false;
    }
};

inline int extend(int v, int nbits) {
    // T.81 F.2.2.1 EXTEND: map the nbits-bit magnitude to a signed value.
    if (nbits == 0) return 0;
    return v < (1 << (nbits - 1)) ? v - (1 << nbits) + 1 : v;
}

struct Comp {
    int id = 0;
    int h = 1, v = 1;
    int tq = 0;
    int td = 0, ta = 0;
    uint32_t by = 0, bx = 0;   // padded block grid (MCU multiple)
    uint32_t nby = 0, nbx = 0; // true (non-interleaved) block counts
    int16_t* coef = nullptr;
    int pred = 0;
};

struct Decoder {
    const uint8_t* data;
    size_t len;
    size_t pos = 0;

    HuffDecodeTable dc[4], ac[4];
    uint16_t qtab[4][64] = {};
    Comp comps[3];
    int ncomp = 0;
    uint32_t width = 0, height = 0;
    bool progressive = false;
    int adobe_transform = -1;  // -1 = JFIF/none seen
    uint32_t restart_interval = 0;
    uint32_t mcus_x = 0, mcus_y = 0;
    int hmax = 1, vmax = 1;

    bool error_ = false;

    uint8_t u8() { return pos < len ? data[pos++] : (error_ = true, 0); }
    uint16_t u16() {
        uint16_t hi = u8();
        return uint16_t((hi << 8) | u8());
    }

    // One DHT segment body (shared by the pre-SOS header walk and the
    // inter-scan segment walk in ce_jpeg_parse).
    bool parse_dht(size_t seg_end) {
        while (pos < seg_end) {
            int tcth = u8();
            int tc = tcth >> 4, th = tcth & 15;
            if (th > 3) return false;
            uint8_t bits[17] = {0};
            int n = 0;
            for (int l = 1; l <= 16; ++l) {
                bits[l] = u8();
                n += bits[l];
            }
            if (n > 256 || pos + size_t(n) > seg_end) return false;
            (tc == 0 ? dc[th] : ac[th]).build(bits, data + pos, n);
            pos += n;
        }
        return true;
    }

    bool parse_headers_until_sos() {
        // caller positioned after SOI
        for (;;) {
            // find next marker
            while (pos < len && data[pos] != 0xFF) ++pos;
            while (pos < len && data[pos] == 0xFF) ++pos;
            if (pos >= len) return false;
            uint8_t m = data[pos];
            ++pos;
            if (m == 0xD9) return false;  // EOI before SOS
            if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) continue;  // standalone
            uint16_t seglen = u16();
            if (seglen < 2) return false;  // would move the cursor backward
            size_t seg_end = pos + seglen - 2;
            if (seg_end > len) return false;
            switch (m) {
                case 0xC0:  // SOF0 baseline
                case 0xC1:  // SOF1 extended sequential (same entropy coding)
                case 0xC2:  // SOF2 progressive
                {
                    progressive = (m == 0xC2);
                    int prec = u8();
                    height = u16();
                    width = u16();
                    ncomp = u8();
                    if (prec != 8 || (ncomp != 3 && ncomp != 1)) return false;
                    for (int c = 0; c < ncomp; ++c) {
                        comps[c].id = u8();
                        int hv = u8();
                        comps[c].h = hv >> 4;
                        comps[c].v = hv & 15;
                        comps[c].tq = u8();
                        if (comps[c].h < 1 || comps[c].h > 2 ||
                            comps[c].v < 1 || comps[c].v > 2 ||
                            comps[c].tq > 3)
                            return false;
                    }
                    if (ncomp == 1) {
                        // grayscale: a single non-subsampled component
                        comps[0].h = comps[0].v = 1;
                    } else if (comps[1].h != comps[2].h ||
                               comps[1].v != comps[2].v ||
                               comps[1].h != 1 || comps[1].v != 1)
                        // chroma must share sampling; luma is component 0
                        return false;
                    hmax = comps[0].h;
                    vmax = comps[0].v;
                    mcus_x = (width + 8u * hmax - 1) / (8u * hmax);
                    mcus_y = (height + 8u * vmax - 1) / (8u * vmax);
                    for (int c = 0; c < ncomp; ++c) {
                        comps[c].bx = mcus_x * comps[c].h;
                        comps[c].by = mcus_y * comps[c].v;
                        uint32_t cw = (width * comps[c].h + hmax - 1) / hmax;
                        uint32_t ch = (height * comps[c].v + vmax - 1) / vmax;
                        comps[c].nbx = (cw + 7) / 8;
                        comps[c].nby = (ch + 7) / 8;
                    }
                    break;
                }
                case 0xC4:  // DHT
                    if (!parse_dht(seg_end)) return false;
                    break;
                case 0xDB: {  // DQT
                    while (pos < seg_end) {
                        int pq_tq = u8();
                        int pq = pq_tq >> 4, tq = pq_tq & 15;
                        if (tq > 3) return false;
                        for (int k = 0; k < 64; ++k)
                            qtab[tq][k] = pq ? u16() : u8();
                    }
                    break;
                }
                case 0xDD:  // DRI
                    restart_interval = u16();
                    break;
                case 0xEE: {  // APP14 Adobe
                    // transform is the 12th body byte (T-REC-T.872 6.5.3);
                    // seg_end - 1 would misread padded/extended segments.
                    if (seglen >= 14 && pos + 12 <= len &&
                        std::memcmp(data + pos, "Adobe", 5) == 0)
                        adobe_transform = data[pos + 11];
                    pos = seg_end;
                    break;
                }
                case 0xC3: case 0xC5: case 0xC6: case 0xC7:
                case 0xC9: case 0xCA: case 0xCB: case 0xCC:
                case 0xCD: case 0xCE: case 0xCF:
                    return false;  // unsupported coding process
                case 0xDA:  // SOS — caller takes over (pos at scan header body)
                    pos -= 2;   // rewind the length field for decode_scan
                    return true;
                default:
                    pos = seg_end;
                    break;
            }
            if (m != 0xDA) pos = seg_end > pos ? seg_end : pos;
        }
    }

    // ---- scans ------------------------------------------------------------

    int16_t* block_at(Comp& co, uint32_t byi, uint32_t bxi) {
        return co.coef + (size_t(byi) * co.bx + bxi) * 64;
    }

    bool decode_scan() {
        uint16_t seglen = u16();
        (void)seglen;
        int ns = u8();
        if (ns < 1 || ns > 3 || ns > ncomp) return false;
        int idx[3];
        for (int i = 0; i < ns; ++i) {
            int cs = u8();
            int tdta = u8();
            int found = -1;
            for (int c = 0; c < ncomp; ++c)
                if (comps[c].id == cs) found = c;
            if (found < 0) return false;
            comps[found].td = tdta >> 4;
            comps[found].ta = tdta & 15;
            if (comps[found].td > 3 || comps[found].ta > 3) return false;
            idx[i] = found;
        }
        int ss = u8();
        int se = u8();
        int ahal = u8();
        int ah = ahal >> 4, al = ahal & 15;
        if (ss > se || se > 63) return false;
        if (progressive && ss == 0 && se != 0) return false;  // G.1.1.1.1
        if (error_) return false;  // truncated scan header

        BitReader br{data, len, pos};
        bool ok;
        if (!progressive) {
            ok = scan_baseline(br, idx, ns);
        } else if (ss == 0) {
            ok = ah == 0 ? scan_dc_first(br, idx, ns, al)
                         : scan_dc_refine(br, idx, ns, al);
        } else {
            if (ns != 1) return false;
            Comp& co = comps[idx[0]];
            ok = ah == 0 ? scan_ac_first(br, co, ss, se, al)
                         : scan_ac_refine(br, co, ss, se, al);
        }
        if (!ok || br.error) return false;
        // resync to the marker that ended the scan
        pos = br.pos;
        while (pos + 1 < len && !(data[pos] == 0xFF && data[pos + 1] != 0x00))
            ++pos;
        return true;
    }

    // One interleaved (or single-component) MCU walk shared by the
    // baseline and progressive-DC-first scans.
    template <typename PerBlock>
    bool mcu_walk(BitReader& br, const int* idx, int ns, PerBlock&& fn) {
        for (int i = 0; i < ns; ++i) comps[idx[i]].pred = 0;
        uint32_t wx = ns == 1 ? comps[idx[0]].nbx : mcus_x;
        uint32_t wy = ns == 1 ? comps[idx[0]].nby : mcus_y;
        uint32_t togo = restart_interval;
        for (uint32_t my = 0; my < wy; ++my)
            for (uint32_t mx = 0; mx < wx; ++mx) {
                if (restart_interval && togo == 0) {
                    if (!br.sync_restart()) return false;
                    for (int i = 0; i < ns; ++i) comps[idx[i]].pred = 0;
                    togo = restart_interval;
                }
                if (restart_interval) --togo;
                if (ns == 1) {
                    Comp& co = comps[idx[0]];
                    if (!fn(co, my, mx)) return false;
                } else {
                    for (int i = 0; i < ns; ++i) {
                        Comp& co = comps[idx[i]];
                        for (int v = 0; v < co.v; ++v)
                            for (int h2 = 0; h2 < co.h; ++h2)
                                if (!fn(co, my * co.v + v, mx * co.h + h2))
                                    return false;
                    }
                }
                if (br.error) return false;
            }
        return true;
    }

    bool scan_baseline(BitReader& br, const int* idx, int ns) {
        return mcu_walk(br, idx, ns, [&](Comp& co, uint32_t byi, uint32_t bxi) {
            int16_t* blk = block_at(co, byi, bxi);
            int t = br.decode(dc[co.td]);
            if (t > 11) return false;  // 8-bit DC category cap (T.81 F.1.2.1.2)
            int diff = t ? extend(br.get_bits(t), t) : 0;
            co.pred += diff;
            blk[0] = int16_t(co.pred);
            int k = 1;
            while (k < 64) {
                int rs = br.decode(ac[co.ta]);
                int r = rs >> 4, s = rs & 15;
                if (s == 0) {
                    if (r != 15) break;  // EOB
                    k += 16;             // ZRL
                } else {
                    k += r;
                    if (k > 63) return false;
                    blk[k] = int16_t(extend(br.get_bits(s), s));
                    ++k;
                }
            }
            return !br.error;
        });
    }

    bool scan_dc_first(BitReader& br, const int* idx, int ns, int al) {
        return mcu_walk(br, idx, ns, [&](Comp& co, uint32_t byi, uint32_t bxi) {
            int t = br.decode(dc[co.td]);
            if (t > 11) return false;  // 8-bit DC category cap (T.81 F.1.2.1.2)
            int diff = t ? extend(br.get_bits(t), t) : 0;
            co.pred += diff;
            block_at(co, byi, bxi)[0] = int16_t(co.pred << al);
            return !br.error;
        });
    }

    bool scan_dc_refine(BitReader& br, const int* idx, int ns, int al) {
        return mcu_walk(br, idx, ns, [&](Comp& co, uint32_t byi, uint32_t bxi) {
            if (br.get_bit())
                block_at(co, byi, bxi)[0] |= int16_t(1 << al);
            return !br.error;
        });
    }

    bool scan_ac_first(BitReader& br, Comp& co, int ss, int se, int al) {
        uint32_t eobrun = 0;
        uint32_t togo = restart_interval;
        for (uint32_t byi = 0; byi < co.nby; ++byi)
            for (uint32_t bxi = 0; bxi < co.nbx; ++bxi) {
                if (restart_interval && togo == 0) {
                    if (!br.sync_restart()) return false;
                    eobrun = 0;
                    togo = restart_interval;
                }
                if (restart_interval) --togo;
                int16_t* blk = block_at(co, byi, bxi);
                if (eobrun > 0) { --eobrun; continue; }
                int k = ss;
                while (k <= se) {
                    int rs = br.decode(ac[co.ta]);
                    int r = rs >> 4, s = rs & 15;
                    if (s == 0) {
                        if (r != 15) {
                            eobrun = (1u << r) - 1;
                            if (r) eobrun += uint32_t(br.get_bits(r));
                            break;
                        }
                        k += 16;
                    } else {
                        k += r;
                        if (k > se) return false;
                        blk[k] = int16_t(extend(br.get_bits(s), s) << al);
                        ++k;
                    }
                    if (br.error) return false;
                }
            }
        return !br.error;
    }

    // T.81 G.1.2.3 / G.2: AC successive-approximation refinement.
    bool scan_ac_refine(BitReader& br, Comp& co, int ss, int se, int al) {
        const int p1 = 1 << al;
        const int m1 = -(1 << al);
        uint32_t eobrun = 0;
        uint32_t togo = restart_interval;
        for (uint32_t byi = 0; byi < co.nby; ++byi)
            for (uint32_t bxi = 0; bxi < co.nbx; ++bxi) {
                if (restart_interval && togo == 0) {
                    if (!br.sync_restart()) return false;
                    eobrun = 0;
                    togo = restart_interval;
                }
                if (restart_interval) --togo;
                int16_t* blk = block_at(co, byi, bxi);
                int k = ss;
                if (eobrun == 0) {
                    while (k <= se) {
                        int rs = br.decode(ac[co.ta]);
                        if (br.error) return false;
                        int r = rs >> 4, s = rs & 15;
                        int newval = 0;
                        if (s == 0) {
                            if (r != 15) {
                                eobrun = (1u << r);
                                if (r) eobrun += uint32_t(br.get_bits(r));
                                break;  // rest of block in the EOB pass below
                            }
                            // ZRL: skip 16 zero-history coefficients
                        } else {
                            if (s != 1) return false;
                            newval = br.get_bit() ? p1 : m1;
                        }
                        // advance past r zero-history positions, applying
                        // correction bits to nonzero-history ones en route
                        while (k <= se) {
                            if (blk[k] != 0) {
                                if (br.get_bit() && (blk[k] & p1) == 0)
                                    blk[k] += int16_t(blk[k] >= 0 ? p1 : m1);
                            } else {
                                if (r == 0) break;
                                --r;
                            }
                            ++k;
                            if (br.error) return false;
                        }
                        if (newval != 0 && k <= se) blk[k] = int16_t(newval);
                        ++k;
                    }
                }
                if (eobrun > 0) {
                    // EOB pass: correction bits for every remaining
                    // nonzero-history coefficient.
                    while (k <= se) {
                        if (blk[k] != 0) {
                            if (br.get_bit() && (blk[k] & p1) == 0)
                                blk[k] += int16_t(blk[k] >= 0 ? p1 : m1);
                            if (br.error) return false;
                        }
                        ++k;
                    }
                    --eobrun;
                }
            }
        return !br.error;
    }
};

}  // namespace

extern "C" {

// Parse a JPEG stream to quantized zigzag coefficient planes.
//
// Two-call protocol: with y/cb/cr null, only `hdr` is filled (so the
// caller can size the buffers); with buffers given, the full entropy
// decode runs.  hdr (uint32[16]): [0]=width [1]=height [2]=ncomp
// [3]=h_luma [4]=v_luma [5]=by_y [6]=bx_y [7]=by_c [8]=bx_c
// [9]=progressive [10]=adobe_transform+1 (0 = none/JFIF)
// [11]=restart_interval.  Coefficient planes are written in ZIGZAG order
// on the padded MCU grid, matching the tpujpeg encoder's layout.
// qtables are the DEQUANTIZATION tables in zigzag order.
// Returns 0 on success, -1 on parse/entropy error, -2 on unsupported
// stream (non-8-bit, ncomp != 3, sampling > 2x2, chroma subsampled
// differently, arithmetic/lossless/hierarchical).
int64_t ce_jpeg_parse(
    const uint8_t* data, size_t len,
    uint32_t* hdr /*16*/,
    int16_t* y_out, int16_t* cb_out, int16_t* cr_out,
    uint16_t* qtab_luma_zz, uint16_t* qtab_chroma_zz) {
    if (!data || len < 4 || !hdr) return -1;
    if (!(data[0] == 0xFF && data[1] == 0xD8)) return -1;

    Decoder d;
    d.data = data;
    d.len = len;
    d.pos = 2;
    if (!d.parse_headers_until_sos()) return -2;

    std::memset(hdr, 0, 16 * sizeof(uint32_t));
    hdr[0] = d.width;
    hdr[1] = d.height;
    hdr[2] = uint32_t(d.ncomp);
    hdr[3] = uint32_t(d.comps[0].h);
    hdr[4] = uint32_t(d.comps[0].v);
    hdr[5] = d.comps[0].by;
    hdr[6] = d.comps[0].bx;
    hdr[7] = d.comps[1].by;
    hdr[8] = d.comps[1].bx;
    hdr[9] = d.progressive ? 1 : 0;
    hdr[10] = uint32_t(d.adobe_transform + 1);
    hdr[11] = d.restart_interval;
    bool gray = d.ncomp == 1;
    if (gray) hdr[7] = hdr[8] = 0;  // no chroma planes
    if (!y_out || (!gray && (!cb_out || !cr_out)))
        return y_out ? -1 : 0;  // header-only call needs no buffers

    d.comps[0].coef = y_out;
    std::memset(y_out, 0, size_t(d.comps[0].by) * d.comps[0].bx * 64 * 2);
    if (!gray) {
        d.comps[1].coef = cb_out;
        d.comps[2].coef = cr_out;
        std::memset(cb_out, 0, size_t(d.comps[1].by) * d.comps[1].bx * 64 * 2);
        std::memset(cr_out, 0, size_t(d.comps[2].by) * d.comps[2].bx * 64 * 2);
    }

    // First SOS is already positioned (pos at the scan header's length
    // field); decode it, then walk markers: DHT/DQT/DRI segments may
    // precede every further SOS (libjpeg emits fresh DHTs per scan).
    if (!d.decode_scan()) return -1;
    for (;;) {
        while (d.pos + 1 < d.len &&
               !(d.data[d.pos] == 0xFF && d.data[d.pos + 1] != 0x00))
            ++d.pos;
        if (d.pos + 1 >= d.len) break;
        uint8_t m = d.data[d.pos + 1];
        if (m == 0xD9) break;  // EOI
        d.pos += 2;
        if (m >= 0xD0 && m <= 0xD7) continue;  // stray RST between scans
        if (m == 0xDA) {
            if (!d.decode_scan()) return -1;
            continue;
        }
        // other segment (DHT/DQT/DRI/APPn/COM) between scans
        if (m == 0xC4 || m == 0xDB || m == 0xDD || (m >= 0xE0 && m <= 0xEF) ||
            m == 0xFE) {
            uint16_t seglen = d.u16();
            if (seglen < 2) return -1;  // would move the cursor backward
            size_t seg_end = d.pos + seglen - 2;
            if (seg_end > d.len) return -1;
            if (m == 0xC4) {
                if (!d.parse_dht(seg_end)) return -1;
            } else if (m == 0xDD) {
                d.restart_interval = d.u16();
            }
            d.pos = seg_end;
            continue;
        }
        return -1;  // unexpected marker mid-stream
    }

    if (qtab_luma_zz)
        std::memcpy(qtab_luma_zz, d.qtab[d.comps[0].tq], 64 * 2);
    if (qtab_chroma_zz)
        std::memcpy(
            qtab_chroma_zz, d.qtab[d.comps[gray ? 0 : 1].tq], 64 * 2);
    return 0;
}

}  // extern "C"
