// FLAC stream decoder (native, no libFLAC).
//
// The reference loads .flac inputs through soundfile/libsndfile
// (main/library/utils.py load_audio); this image has neither, so the
// framework ships its own decoder.  Scope: everything real encoders
// emit — constant / verbatim / fixed(0-4) / LPC subframes, rice &
// rice2 residual partitions, independent + left-side/right-side/
// mid-side stereo decorrelation, UTF-8 frame numbers, 4..32 bps.
// CRCs are parsed but not enforced (decode is validated against
// synthetic streams in tests/test_flac.py).
//
// C ABI (ctypes):
//   flac_probe(data, n, &sr, &channels, &bps, &total_samples) -> 0/err
//   flac_decode(data, n, out, out_capacity_samples) -> samples written
//     (interleaved int32, sign-extended to 32 bits) or -err

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte = 0;
    int bit = 0;  // bits consumed in current byte (0..7)
    bool error = false;

    bool eof() const { return byte >= size; }

    uint32_t read_bit() {
        if (byte >= size) { error = true; return 0; }
        uint32_t b = (data[byte] >> (7 - bit)) & 1u;
        if (++bit == 8) { bit = 0; ++byte; }
        return b;
    }

    uint64_t read_bits64(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
        return v;
    }

    uint32_t read_bits(int n) { return (uint32_t)read_bits64(n); }

    int64_t read_signed(int n) {
        if (n == 0) return 0;
        uint64_t v = read_bits64(n);
        uint64_t sign = 1ull << (n - 1);
        return (v & sign) ? (int64_t)(v - (sign << 1)) : (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (!error && read_bit() == 0) ++q;
        return q;
    }

    void align_byte() { if (bit) { bit = 0; ++byte; } }
};

// rice/golomb: unary quotient, 'param' remainder bits, zigzag
int64_t read_rice(BitReader& br, int param) {
    uint32_t q = br.read_unary();
    uint64_t r = br.read_bits64(param);
    uint64_t u = ((uint64_t)q << param) | r;
    return (u & 1) ? -((int64_t)(u >> 1)) - 1 : (int64_t)(u >> 1);
}

// UTF-8-style coded number (frame header sample/frame number; up to 36 bits)
int64_t read_utf8_number(BitReader& br) {
    uint32_t b0 = br.read_bits(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    uint32_t mask = 0x80;
    while (b0 & mask) { ++n; mask >>= 1; }
    if (n < 2 || n > 7) { br.error = true; return -1; }
    int64_t v = b0 & (0x7F >> n);
    for (int i = 1; i < n; ++i) {
        uint32_t b = br.read_bits(8);
        if ((b & 0xC0) != 0x80) { br.error = true; return -1; }
        v = (v << 6) | (b & 0x3F);
    }
    return v;
}

struct StreamInfo {
    uint32_t sample_rate = 0;
    int channels = 0;
    int bps = 0;
    uint64_t total_samples = 0;
    size_t frames_offset = 0;  // byte offset of first audio frame
};

int parse_header(const uint8_t* data, size_t n, StreamInfo& si) {
    if (n < 8 || memcmp(data, "fLaC", 4) != 0) return 1;
    size_t pos = 4;
    bool last = false;
    bool have_streaminfo = false;
    while (!last) {
        if (pos + 4 > n) return 2;
        last = (data[pos] & 0x80) != 0;
        int type = data[pos] & 0x7F;
        uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                       ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
        pos += 4;
        if (pos + len > n) return 2;
        if (type == 0 && len >= 34) {  // STREAMINFO
            BitReader br{data + pos, len};
            br.read_bits(16);  // min blocksize
            br.read_bits(16);  // max blocksize
            br.read_bits(24);  // min framesize
            br.read_bits(24);  // max framesize
            si.sample_rate = br.read_bits(20);
            si.channels = (int)br.read_bits(3) + 1;
            si.bps = (int)br.read_bits(5) + 1;
            si.total_samples = br.read_bits64(36);
            have_streaminfo = true;
        }
        pos += len;
    }
    if (!have_streaminfo) return 3;
    si.frames_offset = pos;
    return 0;
}

const uint32_t kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, 0, 0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const uint32_t kSampleRates[12] = {0, 88200, 176400, 192000, 8000, 16000,
                                   22050, 24000, 32000, 44100, 48000, 96000};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// fixed-predictor coefficients, orders 0..4
void predict_fixed(int order, int64_t* s, uint32_t blocksize) {
    switch (order) {
    case 0: break;
    case 1:
        for (uint32_t i = 1; i < blocksize; ++i) s[i] += s[i - 1];
        break;
    case 2:
        for (uint32_t i = 2; i < blocksize; ++i)
            s[i] += 2 * s[i - 1] - s[i - 2];
        break;
    case 3:
        for (uint32_t i = 3; i < blocksize; ++i)
            s[i] += 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3];
        break;
    case 4:
        for (uint32_t i = 4; i < blocksize; ++i)
            s[i] += 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4];
        break;
    }
}

bool read_residual(BitReader& br, int order, uint32_t blocksize, int64_t* s) {
    int method = (int)br.read_bits(2);
    if (method > 1) return false;
    int plen = method == 0 ? 4 : 5;
    int escape = method == 0 ? 15 : 31;
    int porder = (int)br.read_bits(4);
    uint32_t partitions = 1u << porder;
    if (blocksize % partitions != 0) return false;
    uint32_t psize = blocksize >> porder;
    uint32_t idx = order;
    for (uint32_t p = 0; p < partitions; ++p) {
        uint32_t count = psize - (p == 0 ? (uint32_t)order : 0);
        int param = (int)br.read_bits(plen);
        if (param == escape) {
            int raw = (int)br.read_bits(5);
            for (uint32_t i = 0; i < count; ++i)
                s[idx++] = br.read_signed(raw);
        } else {
            for (uint32_t i = 0; i < count; ++i)
                s[idx++] = read_rice(br, param);
        }
        if (br.error) return false;
    }
    return true;
}

bool read_subframe(BitReader& br, uint32_t blocksize, int bps, int64_t* s) {
    if (br.read_bit() != 0) return false;  // padding bit
    int type = (int)br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = 1 + (int)br.read_unary();
    bps -= wasted;

    if (type == 0) {  // CONSTANT
        int64_t v = br.read_signed(bps);
        for (uint32_t i = 0; i < blocksize; ++i) s[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (uint32_t i = 0; i < blocksize; ++i) s[i] = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {  // FIXED order 0..4
        int order = type - 8;
        for (int i = 0; i < order; ++i) s[i] = br.read_signed(bps);
        if (!read_residual(br, order, blocksize, s)) return false;
        predict_fixed(order, s, blocksize);
    } else if (type >= 32) {  // LPC, order 1..32
        int order = (type & 31) + 1;
        for (int i = 0; i < order; ++i) s[i] = br.read_signed(bps);
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // 1111 is invalid
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        int64_t coef[32];
        for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
        if (!read_residual(br, order, blocksize, s)) return false;
        for (uint32_t i = order; i < blocksize; ++i) {
            int64_t pred = 0;
            for (int j = 0; j < order; ++j) pred += coef[j] * s[i - 1 - j];
            s[i] += pred >> shift;
        }
    } else {
        return false;  // reserved
    }
    if (wasted)
        for (uint32_t i = 0; i < blocksize; ++i) s[i] <<= wasted;
    return !br.error;
}

}  // namespace

extern "C" {

int flac_probe(const uint8_t* data, long long n, int* sample_rate,
               int* channels, int* bps, long long* total_samples) {
    StreamInfo si;
    int err = parse_header(data, (size_t)n, si);
    if (err) return err;
    *sample_rate = (int)si.sample_rate;
    *channels = si.channels;
    *bps = si.bps;
    *total_samples = (long long)si.total_samples;
    return 0;
}

// Decode the whole stream into interleaved int32. Returns sample count
// (frames*channels) or -err.
long long flac_decode(const uint8_t* data, long long n, int32_t* out,
                      long long out_capacity) {
    StreamInfo si;
    int err = parse_header(data, (size_t)n, si);
    if (err) return -err;
    const int max_bs = 65536;
    static thread_local int64_t chan_buf[8][max_bs];

    BitReader br{data, (size_t)n};
    br.byte = si.frames_offset;
    long long written = 0;

    while (br.byte < br.size) {
        // frame sync: 11111111 111110xx
        uint32_t sync = br.read_bits(14);
        if (br.error) break;
        if (sync != 0x3FFE) return -10;
        br.read_bit();                       // reserved
        br.read_bit();                       // blocking strategy
        uint32_t bs_code = br.read_bits(4);
        uint32_t sr_code = br.read_bits(4);
        uint32_t ch_code = br.read_bits(4);
        uint32_t ss_code = br.read_bits(3);
        br.read_bit();                       // reserved
        if (read_utf8_number(br) < 0) return -11;

        uint32_t blocksize;
        if (bs_code == 6) blocksize = br.read_bits(8) + 1;
        else if (bs_code == 7) blocksize = br.read_bits(16) + 1;
        else blocksize = kBlockSizes[bs_code];
        if (blocksize == 0 || blocksize > (uint32_t)max_bs) return -12;
        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
        int bps = ss_code ? kSampleSizes[ss_code] : si.bps;
        if (bps == 0) return -13;
        br.read_bits(8);                     // CRC-8 (unchecked)

        int channels;
        bool left_side = false, right_side = false, mid_side = false;
        if (ch_code < 8) {
            channels = (int)ch_code + 1;
        } else {
            channels = 2;
            left_side = ch_code == 8;
            right_side = ch_code == 9;
            mid_side = ch_code == 10;
            if (ch_code > 10) return -14;
        }
        if (channels > 8) return -14;

        for (int c = 0; c < channels; ++c) {
            int sub_bps = bps;
            // the side channel carries one extra bit
            if ((left_side && c == 1) || (right_side && c == 0) ||
                (mid_side && c == 1))
                sub_bps += 1;
            if (!read_subframe(br, blocksize, sub_bps, chan_buf[c]))
                return -15;
        }
        br.align_byte();
        br.read_bits(16);                    // CRC-16 (unchecked)
        if (br.error) return -16;

        // undo stereo decorrelation
        if (left_side) {
            for (uint32_t i = 0; i < blocksize; ++i)
                chan_buf[1][i] = chan_buf[0][i] - chan_buf[1][i];
        } else if (right_side) {
            for (uint32_t i = 0; i < blocksize; ++i)
                chan_buf[0][i] = chan_buf[0][i] + chan_buf[1][i];
        } else if (mid_side) {
            for (uint32_t i = 0; i < blocksize; ++i) {
                int64_t mid = chan_buf[0][i];
                int64_t side = chan_buf[1][i];
                mid = (mid << 1) | (side & 1);
                chan_buf[0][i] = (mid + side) >> 1;
                chan_buf[1][i] = (mid - side) >> 1;
            }
        }

        if (written + (long long)blocksize * channels > out_capacity)
            return -17;
        for (uint32_t i = 0; i < blocksize; ++i)
            for (int c = 0; c < channels; ++c)
                out[written++] = (int32_t)chan_buf[c][i];

        if (si.total_samples &&
            (uint64_t)(written / channels) >= si.total_samples)
            break;
    }
    return written;
}

}  // extern "C"
