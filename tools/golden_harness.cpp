// Golden test-vector generator.
//
// Compiles the *reference* implementation's DSP stages (from /root/reference,
// read-only) into a standalone dumper, so the TPU-native reimplementation in
// this repository can be validated bit-exactly against the original without
// building the whole odr-dabmod binary (FFTW/ZMQ are unavailable here).
//
// Build (see tools/make_golden.sh):
//   g++ -O2 -std=c++17 -I$REF/src -I$REF/lib -I$REF golden_harness.cpp \
//       $REF/src/{PrbsGenerator,ConvEncoder,PuncturingEncoder,PuncturingRule,\
//                 TimeInterleaver,QpskSymbolMapper,FrequencyInterleaver,\
//                 PhaseReference,DifferentialModulator,GuardIntervalInserter,\
//                 TII,SubchannelSource,FicSource,Buffer,ModPlugin}.cpp \
//       golden_stubs.cpp -o refgold
//
// Usage: refgold <outdir>   -- writes <name>.bin files + manifest.txt lines
//                              "<name> <dtype> <n_elements>"

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <complex>

#include "Buffer.h"
#include "PrbsGenerator.h"
#include "ConvEncoder.h"
#include "PuncturingEncoder.h"
#include "TimeInterleaver.h"
#include "QpskSymbolMapper.h"
#include "FrequencyInterleaver.h"
#include "PhaseReference.h"
#include "DifferentialModulator.h"
#include "GuardIntervalInserter.h"
#include "TII.h"
#include "SubchannelSource.h"
#include "FicSource.h"
#include "FrameMultiplexer.h"
#include "BlockPartitioner.h"
#include "EtiReader.h"
#include "OfdmGenerator.h"

// EtiSource::getFic is defined in EtiReader.cpp, which we don't compile.
std::shared_ptr<FicSource>& EtiSource::getFic() { return myFicSource; }

// Fixed-layout ETI source for the end-to-end front-end chain.
class FakeEtiSource : public EtiSource {
public:
    unsigned getMode() override { return 1; }
    unsigned getFp() override { return 0; }
    unsigned getFct() override { return 0; }
    frame_timestamp getTimestamp() override { return frame_timestamp(); }
    const std::vector<std::shared_ptr<SubchannelSource> > getSubchannels()
            const override { return m_subs; }
    std::vector<std::shared_ptr<SubchannelSource> > m_subs;
};

static FILE* g_manifest = nullptr;
static std::string g_outdir;

static void dump(const std::string& name, const char* dtype,
                 const void* data, size_t bytes, size_t elems) {
    std::string path = g_outdir + "/" + name + ".bin";
    FILE* f = fopen(path.c_str(), "wb");
    fwrite(data, 1, bytes, f);
    fclose(f);
    fprintf(g_manifest, "%s %s %zu\n", name.c_str(), dtype, elems);
}

static void dump_buf_u8(const std::string& name, Buffer& b) {
    dump(name, "u8", b.getData(), b.getLength(), b.getLength());
}

static void dump_buf_cf(const std::string& name, Buffer& b) {
    dump(name, "c8", b.getData(), b.getLength(),
         b.getLength() / sizeof(complexf));
}

// Deterministic xorshift PRNG so Python tests can regenerate the inputs.
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t xorshift64() {
    uint64_t x = rng_state;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    rng_state = x;
    return x;
}
static void fill_bytes(Buffer& b, size_t n) {
    b.setLength(n);
    uint8_t* p = reinterpret_cast<uint8_t*>(b.getData());
    for (size_t i = 0; i < n; i++) p[i] = xorshift64() & 0xff;
}
static void fill_cf(Buffer& b, size_t n) {
    b.setLength(n * sizeof(complexf));
    complexf* p = reinterpret_cast<complexf*>(b.getData());
    for (size_t i = 0; i < n; i++) {
        float re = (int64_t)(xorshift64() % 2000001) / 1000000.0f - 1.0f;
        float im = (int64_t)(xorshift64() % 2000001) / 1000000.0f - 1.0f;
        p[i] = complexf(re, im);
    }
}

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: refgold <outdir>\n"); return 1; }
    g_outdir = argv[1];
    g_manifest = fopen((g_outdir + "/manifest.txt").c_str(), "w");

    // ---- PRBS ----
    for (size_t n : {96u, 288u, 6912u}) {
        PrbsGenerator prbs(n, 0x110);
        Buffer out;
        prbs.process({}, {&out});
        dump_buf_u8("prbs_" + std::to_string(n), out);
    }
    {   // PRBS applied onto data (XOR path)
        PrbsGenerator prbs(96, 0x110);
        Buffer in, out;
        fill_bytes(in, 96);
        dump_buf_u8("prbs_xor_in", in);
        prbs.process({&in}, {&out});
        dump_buf_u8("prbs_xor_out", out);
    }

    // ---- Convolutional encoder ----
    {
        ConvEncoder conv(96);
        Buffer in, out;
        fill_bytes(in, 96);
        dump_buf_u8("conv_in", in);
        conv.process(&in, &out);
        dump_buf_u8("conv_out", out);
    }

    // ---- FIC puncturing (mid=1 and mid=3) ----
    for (unsigned mid : {1u, 3u}) {
        FicSource fic(1, mid);
        size_t fs = fic.getFramesize();
        ConvEncoder conv(fs);
        PuncturingEncoder punct;
        for (const auto& r : fic.get_rules()) punct.append_rule(r);
        punct.append_tail_rule(PuncturingRule(3, 0xcccccc));
        Buffer in, mid_b, out;
        fill_bytes(in, fs);
        dump_buf_u8("fic_punct_mid" + std::to_string(mid) + "_in", in);
        conv.process(&in, &mid_b);
        punct.process(&mid_b, &out);
        dump_buf_u8("fic_punct_mid" + std::to_string(mid) + "_out", out);
    }

    // ---- Sub-channel puncturing: EEP-A3 64kbps, EEP-B4 96kbps, UEP 128/3,
    //      UEP 32/1 (has padding byte) ----
    struct SubSpec { uint16_t stl; uint8_t tpl; const char* name; };
    for (SubSpec s : { SubSpec{24, 0x22, "eep_a3_64"},
                       SubSpec{36, 0x27, "eep_b4_96"},
                       SubSpec{48, 0x02, "uep_128_3"},
                       SubSpec{12, 0x00, "uep_32_1"} }) {
        SubchannelSource src(0, s.stl, s.tpl);
        ConvEncoder conv(src.framesize());
        PuncturingEncoder punct(src.framesizeCu());
        for (const auto& r : src.get_rules()) punct.append_rule(r);
        punct.append_tail_rule(PuncturingRule(3, 0xcccccc));
        Buffer in, mid_b, out;
        fill_bytes(in, src.framesize());
        dump_buf_u8(std::string("subch_") + s.name + "_in", in);
        conv.process(&in, &mid_b);
        punct.process(&mid_b, &out);
        dump_buf_u8(std::string("subch_") + s.name + "_out", out);
    }

    // ---- Time interleaver: 40 sequential frames of 384 bytes ----
    {
        const size_t fs = 384, T = 40;
        TimeInterleaver ti(fs);
        std::vector<uint8_t> all_in, all_out;
        for (size_t t = 0; t < T; t++) {
            Buffer in, out;
            fill_bytes(in, fs);
            const uint8_t* p = reinterpret_cast<uint8_t*>(in.getData());
            all_in.insert(all_in.end(), p, p + fs);
            ti.process(&in, &out);
            p = reinterpret_cast<uint8_t*>(out.getData());
            all_out.insert(all_out.end(), p, p + fs);
        }
        dump("time_interleaver_in", "u8", all_in.data(), all_in.size(), all_in.size());
        dump("time_interleaver_out", "u8", all_out.data(), all_out.size(), all_out.size());
    }

    // ---- QPSK mapper, mode 1 (one TF worth of bytes) ----
    {
        QpskSymbolMapper map(1536, false);
        Buffer in, out;
        fill_bytes(in, 28800);
        dump_buf_u8("qpsk_in", in);
        map.process(&in, &out);
        dump_buf_cf("qpsk_out", out);
    }

    // ---- Frequency interleaver + phase reference, all modes ----
    for (unsigned mode : {1u, 2u, 3u, 4u}) {
        FrequencyInterleaver fi(mode, false);
        PhaseReference pr(mode, false);
        Buffer ref;
        pr.process(&ref);
        dump_buf_cf("phaseref_m" + std::to_string(mode), ref);
        size_t carriers = ref.getLength() / sizeof(complexf);
        Buffer in, out;
        fill_cf(in, carriers * 3);
        dump_buf_cf("freqint_m" + std::to_string(mode) + "_in", in);
        fi.process(&in, &out);
        dump_buf_cf("freqint_m" + std::to_string(mode) + "_out", out);
    }

    // ---- Differential modulator, mode 1, 75 data symbols ----
    {
        DifferentialModulator dm(1536, false);
        PhaseReference pr(1, false);
        Buffer phase, in, out;
        pr.process(&phase);
        fill_cf(in, 1536 * 75);
        dump_buf_cf("diffmod_in", in);
        std::vector<Buffer*> ins{&phase, &in};
        dm.process(ins, &out);
        dump_buf_cf("diffmod_out", out);
    }

    // ---- Guard interval inserter, mode 1, window 0 and 90 ----
    for (size_t ov : {0u, 90u}) {
        size_t window_overlap = ov;
        GuardIntervalInserter gi(76, 2048, 2656, 2552, window_overlap,
                                 FFTEngine::FFTW);
        Buffer in, out;
        fill_cf(in, 77 * 2048);
        dump_buf_cf("guard_ov" + std::to_string(ov) + "_in", in);
        gi.process(&in, &out);
        dump_buf_cf("guard_ov" + std::to_string(ov) + "_out", out);
    }

    // ---- TII, mode 1 & 2, two comb/pattern combos, both variants ----
    for (unsigned mode : {1u, 2u}) {
        for (int old_variant : {0, 1}) {
            tii_config_t conf;
            conf.enable = true;
            conf.comb = 5;
            conf.pattern = 31;
            conf.old_variant = old_variant;
            TII tii(mode, conf, false);
            PhaseReference pr(mode, false);
            Buffer ref, out;
            pr.process(&ref);
            tii.process(&ref, &out);
            dump_buf_cf("tii_m" + std::to_string(mode) +
                        (old_variant ? "_old" : "_new"), out);
        }
    }

    // ---- TII exhaustive sweep: the A_{c,p} carrier mask for every
    // comb (0-23) x pattern (0-69) x mode (1,2) -- 3360 table rows
    // (src/TII.cpp:106-337).  The mask is recovered exactly by feeding
    // in[i] = i+1 through process(): A_{c,p}(i) <=> out[i]==i+1 and
    // out[i+1]==i+1 (carriers enable in pairs from one source carrier,
    // and adjacent A_{c,p} are never both set).  Packed LSB-first.
    for (unsigned mode : {1u, 2u}) {
        const size_t carriers = (mode == 1) ? 1536 : 384;
        std::vector<uint8_t> blob;
        for (int comb = 0; comb < 24; comb++) {
            for (int pat = 0; pat < 70; pat++) {
                tii_config_t conf;
                conf.enable = true;
                conf.comb = comb;
                conf.pattern = pat;
                conf.old_variant = false;
                TII tii(mode, conf, false);
                Buffer in, out;
                in.setLength(carriers * sizeof(complexf));
                complexf* p = (complexf*)in.getData();
                for (size_t i = 0; i < carriers; i++)
                    p[i] = complexf((float)(i + 1), 0.0f);
                tii.process(&in, &out);
                const complexf* o = (const complexf*)out.getData();
                std::vector<uint8_t> bits((carriers + 7) / 8, 0);
                for (size_t i = 0; i + 1 < carriers; i++) {
                    if (o[i] == complexf((float)(i + 1), 0.0f) &&
                        o[i + 1] == complexf((float)(i + 1), 0.0f)) {
                        bits[i / 8] |= 1 << (i % 8);
                    }
                }
                blob.insert(blob.end(), bits.begin(), bits.end());
            }
        }
        dump("tii_acp_m" + std::to_string(mode), "u8",
             blob.data(), blob.size(), blob.size());
    }

    // ---- UEP/EEP puncturing-rule sweep: the complete rule set and CU
    // size for every protection profile the reference accepts
    // (src/SubchannelSource.cpp:84-958).  Binary rows of u32:
    // [tpl, bitrate, cu, nrules, (len, pattern) x nrules]
    {
        std::vector<uint32_t> rows;
        std::vector<uint8_t> tpls;
        // short form (UEP): tpl 0..63; long form (EEP): 0x20..0x3f
        for (int tpl = 0; tpl < 64; tpl++) tpls.push_back(tpl);
        const int bitrates[] = {8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
                                112, 128, 160, 192, 224, 256, 320, 384};
        for (int br : bitrates) {
            for (uint8_t tpl : tpls) {
                try {
                    // STL is in 64-bit words: framesize = stl*8 bytes,
                    // bitrate = framesize/3 kbps => stl = bitrate*3/8
                    SubchannelSource src(0, br * 3 / 8, tpl);
                    // assemble the whole row before appending: any of
                    // these accessors may throw for an undefined profile
                    std::vector<uint32_t> row;
                    row.push_back(tpl);
                    row.push_back(br);
                    row.push_back((uint32_t)src.framesizeCu());
                    const auto& rules = src.get_rules();
                    row.push_back((uint32_t)rules.size());
                    for (const auto& r : rules) {
                        row.push_back((uint32_t)r.length());
                        row.push_back(r.pattern());
                    }
                    rows.insert(rows.end(), row.begin(), row.end());
                } catch (const std::exception&) {
                    // profile not defined for this bitrate
                }
            }
        }
        dump("subch_rules_sweep", "u8", rows.data(),
             rows.size() * sizeof(uint32_t), rows.size() * sizeof(uint32_t));
    }

    // (phase-ref vectors for all four modes are dumped earlier)

    // ---- End-to-end front ends: ETI payloads -> diff-mod symbol stream ----
    // Modes 2, 3 and 4, one EEP-A3 64kbps sub-channel, 2 TFs each
    // (mode 4 collects 2 CIFs per TF, so it consumes 4 ETI frames).
    for (unsigned mode : {2u, 3u, 4u}) {
        // per-mode RNG seed: adding a mode must not churn the other
        // sections' fixtures
        rng_state = 0xD1B54A32D192ED03ull ^ mode;
        const unsigned mid = mode;          // ETI MID == mode for 2,3,4
        const size_t carriers = (mode == 2) ? 384
                              : (mode == 3) ? 192 : 768;
        const size_t fic_in = (mid == 3) ? 128 : 96;
        const int nframes = (mode == 4) ? 4 : 2;
        FakeEtiSource src;
        src.m_subs.push_back(std::make_shared<SubchannelSource>(0, 24, 0x22));

        PrbsGenerator ficPrbs(fic_in, 0x110);
        ConvEncoder ficConv(fic_in);
        PuncturingEncoder ficPunct;
        FicSource fic(1, mid);
        for (const auto& r : fic.get_rules()) ficPunct.append_rule(r);
        ficPunct.append_tail_rule(PuncturingRule(3, 0xcccccc));

        auto& sub = src.m_subs[0];
        PrbsGenerator sPrbs(sub->framesize(), 0x110);
        ConvEncoder sConv(sub->framesize());
        PuncturingEncoder sPunct(sub->framesizeCu());
        for (const auto& r : sub->get_rules()) sPunct.append_rule(r);
        sPunct.append_tail_rule(PuncturingRule(3, 0xcccccc));
        TimeInterleaver ti(sub->framesizeCu() * 8);

        PrbsGenerator cifPrbs(864 * 8, 0x110);
        FrameMultiplexer mux(src);
        BlockPartitioner part(mode);
        QpskSymbolMapper map(carriers, false);
        FrequencyInterleaver freq(mode, false);
        PhaseReference pref(mode, false);
        DifferentialModulator diff(carriers, false);

        std::vector<uint8_t> all_fic, all_sub;
        std::vector<complexf> all_syms;
        Buffer tfblock;
        for (int frame = 0; frame < nframes; frame++) {
            Buffer ficIn, t1, t2, ficOut;
            fill_bytes(ficIn, fic_in);
            { const uint8_t* p = (const uint8_t*)ficIn.getData();
              all_fic.insert(all_fic.end(), p, p + fic_in); }
            ficPrbs.process({&ficIn}, {&t1});
            ficConv.process(&t1, &t2);
            ficPunct.process(&t2, &ficOut);

            Buffer in, a, b2, c, tiOut;
            fill_bytes(in, sub->framesize());
            { const uint8_t* p = (const uint8_t*)in.getData();
              all_sub.insert(all_sub.end(), p, p + in.getLength()); }
            sPrbs.process({&in}, {&a});
            sConv.process(&a, &b2);
            sPunct.process(&b2, &c);
            ti.process(&c, &tiOut);

            Buffer filler, cif;
            cifPrbs.process({}, {&filler});
            std::vector<Buffer*> muxIn{&filler, &tiOut};
            mux.process(muxIn, &cif);

            std::vector<Buffer*> partIn{&ficOut, &cif};
            int full = part.process(partIn, &tfblock);
            if (full) {
                Buffer mapped, interleaved, ref, symbols;
                map.process(&tfblock, &mapped);
                freq.process(&mapped, &interleaved);
                pref.process(&ref);
                std::vector<Buffer*> diffIn{&ref, &interleaved};
                diff.process(diffIn, &symbols);
                const complexf* p = (const complexf*)symbols.getData();
                all_syms.insert(all_syms.end(),
                                p, p + symbols.getLength() / sizeof(complexf));
            }
        }
        std::string sm = std::to_string(mode);
        dump("e2e_m" + sm + "_fic_in", "u8", all_fic.data(), all_fic.size(),
             all_fic.size());
        dump("e2e_m" + sm + "_sub_in", "u8", all_sub.data(), all_sub.size(),
             all_sub.size());
        dump("e2e_m" + sm + "_symbols", "c8", all_syms.data(),
             all_syms.size() * sizeof(complexf), all_syms.size());
    }

    // Mode 1, two sub-channels: EEP-A3 64kbps @CU0 (48 CU) and UEP 128kbps
    // level 3 @CU48.  8 ETI frames = 2 transmission frames.
    {
        rng_state = 0xA0761D6478BD642Full;   // section-stable fixtures
        FakeEtiSource src;
        src.m_subs.push_back(std::make_shared<SubchannelSource>(0, 24, 0x22));
        src.m_subs.push_back(std::make_shared<SubchannelSource>(48, 48, 0x02));

        PrbsGenerator ficPrbs(96, 0x110);
        ConvEncoder ficConv(96);
        PuncturingEncoder ficPunct;
        FicSource fic(1, 1);
        for (const auto& r : fic.get_rules()) ficPunct.append_rule(r);
        ficPunct.append_tail_rule(PuncturingRule(3, 0xcccccc));

        struct SubChain {
            PrbsGenerator prbs;
            ConvEncoder conv;
            PuncturingEncoder punct;
            TimeInterleaver ti;
            SubChain(size_t fs, size_t cu,
                     const std::vector<PuncturingRule>& rules)
                : prbs(fs, 0x110), conv(fs), punct(cu), ti(cu * 8) {
                for (const auto& r : rules) punct.append_rule(r);
                punct.append_tail_rule(PuncturingRule(3, 0xcccccc));
            }
        };
        std::vector<std::unique_ptr<SubChain>> chains;
        for (auto& s : src.m_subs) {
            chains.emplace_back(std::make_unique<SubChain>(
                s->framesize(), s->framesizeCu(), s->get_rules()));
        }

        PrbsGenerator cifPrbs(864 * 8, 0x110);
        FrameMultiplexer mux(src);
        BlockPartitioner part(1);
        QpskSymbolMapper map(1536, false);
        FrequencyInterleaver freq(1, false);
        PhaseReference pref(1, false);
        DifferentialModulator diff(1536, false);

        std::vector<uint8_t> all_fic, all_sub0, all_sub1;
        std::vector<complexf> all_syms;

        // BlockPartitioner accumulates into its output buffer across calls
        // (the flowgraph keeps edge buffers alive), so it must outlive the
        // frame loop.
        Buffer tfblock;

        for (int frame = 0; frame < 8; frame++) {
            Buffer ficIn, t1, t2, ficOut;
            fill_bytes(ficIn, 96);
            {
                const uint8_t* p = (const uint8_t*)ficIn.getData();
                all_fic.insert(all_fic.end(), p, p + 96);
            }
            ficPrbs.process({&ficIn}, {&t1});
            ficConv.process(&t1, &t2);
            ficPunct.process(&t2, &ficOut);

            std::vector<Buffer> subOut(chains.size());
            for (size_t i = 0; i < chains.size(); i++) {
                Buffer in, a, b, c;
                fill_bytes(in, src.m_subs[i]->framesize());
                const uint8_t* p = (const uint8_t*)in.getData();
                auto& sink = (i == 0) ? all_sub0 : all_sub1;
                sink.insert(sink.end(), p, p + in.getLength());
                chains[i]->prbs.process({&in}, {&a});
                chains[i]->conv.process(&a, &b);
                chains[i]->punct.process(&b, &c);
                chains[i]->ti.process(&c, &subOut[i]);
            }

            Buffer filler, cif;
            cifPrbs.process({}, {&filler});
            std::vector<Buffer*> muxIn{&filler};
            for (auto& b : subOut) muxIn.push_back(&b);
            mux.process(muxIn, &cif);

            std::vector<Buffer*> partIn{&ficOut, &cif};
            int full = part.process(partIn, &tfblock);
            if (full) {
                Buffer mapped, interleaved, ref, symbols;
                map.process(&tfblock, &mapped);
                freq.process(&mapped, &interleaved);
                pref.process(&ref);
                std::vector<Buffer*> diffIn{&ref, &interleaved};
                diff.process(diffIn, &symbols);
                const complexf* p = (const complexf*)symbols.getData();
                all_syms.insert(all_syms.end(),
                                p, p + symbols.getLength() / sizeof(complexf));
            }
        }

        dump("e2e_fic_in", "u8", all_fic.data(), all_fic.size(), all_fic.size());
        dump("e2e_sub0_in", "u8", all_sub0.data(), all_sub0.size(), all_sub0.size());
        dump("e2e_sub1_in", "u8", all_sub1.data(), all_sub1.size(), all_sub1.size());
        dump("e2e_symbols", "c8", all_syms.data(),
             all_syms.size() * sizeof(complexf), all_syms.size());
    }

    // Mode 1, realistic 17-sub-channel mux filling 855/864 CUs with mixed
    // UEP levels and EEP-A/EEP-B profiles (the shape of a production DAB
    // ensemble, vs the 2-sub-channel toy above).  16 ETI frames = 4
    // transmission frames.  Inputs are dumped frame-major as one blob:
    // for each frame, sub0..subN payload bytes concatenated.
    {
        rng_state = 0x243F6A8885A308D3ull;   // section-stable fixtures
        struct RealSub { uint16_t sad; uint16_t stl; uint8_t tpl; };
        const std::vector<RealSub> mux = {
            {  0, 72, 0x02},   // UEP 192 kbps L3   140 CU
            {140, 48, 0x02},   // UEP 128 kbps L3    96 CU
            {236, 48, 0x03},   // UEP 128 kbps L4    84 CU
            {320, 36, 0x22},   // EEP-A3 96 kbps     72 CU
            {392, 36, 0x22},   // EEP-A3 96 kbps     72 CU
            {464, 30, 0x22},   // EEP-A3 80 kbps     60 CU
            {524, 24, 0x22},   // EEP-A3 64 kbps     48 CU
            {572, 24, 0x27},   // EEP-B4 64 kbps     30 CU
            {602, 18, 0x22},   // EEP-A3 48 kbps     36 CU
            {638, 18, 0x21},   // EEP-A2 48 kbps     48 CU
            {686, 12, 0x22},   // EEP-A3 32 kbps     24 CU
            {710, 12, 0x26},   // EEP-B3 32 kbps     18 CU
            {728, 12, 0x20},   // EEP-A1 32 kbps     48 CU
            {776, 12, 0x01},   // UEP 32 kbps L2     29 CU
            {805, 12, 0x26},   // EEP-B3 32 kbps     18 CU
            {823,  3, 0x21},   // EEP-A2 8 kbps       8 CU
            {831, 12, 0x22},   // EEP-A3 32 kbps     24 CU -> ends at 855
        };
        FakeEtiSource src;
        for (auto& m : mux)
            src.m_subs.push_back(
                std::make_shared<SubchannelSource>(m.sad, m.stl, m.tpl));

        PrbsGenerator ficPrbs(96, 0x110);
        ConvEncoder ficConv(96);
        PuncturingEncoder ficPunct;
        FicSource fic(1, 1);
        for (const auto& r : fic.get_rules()) ficPunct.append_rule(r);
        ficPunct.append_tail_rule(PuncturingRule(3, 0xcccccc));

        struct SubChain {
            PrbsGenerator prbs;
            ConvEncoder conv;
            PuncturingEncoder punct;
            TimeInterleaver ti;
            SubChain(size_t fs, size_t cu,
                     const std::vector<PuncturingRule>& rules)
                : prbs(fs, 0x110), conv(fs), punct(cu), ti(cu * 8) {
                for (const auto& r : rules) punct.append_rule(r);
                punct.append_tail_rule(PuncturingRule(3, 0xcccccc));
            }
        };
        std::vector<std::unique_ptr<SubChain>> chains;
        for (auto& s : src.m_subs) {
            chains.emplace_back(std::make_unique<SubChain>(
                s->framesize(), s->framesizeCu(), s->get_rules()));
        }

        PrbsGenerator cifPrbs(864 * 8, 0x110);
        FrameMultiplexer muxer(src);
        BlockPartitioner part(1);
        QpskSymbolMapper map(1536, false);
        FrequencyInterleaver freq(1, false);
        PhaseReference pref(1, false);
        DifferentialModulator diff(1536, false);

        std::vector<uint8_t> all_fic, all_sub;
        std::vector<complexf> all_syms;
        Buffer tfblock;

        for (int frame = 0; frame < 16; frame++) {
            Buffer ficIn, t1, t2, ficOut;
            fill_bytes(ficIn, 96);
            {
                const uint8_t* p = (const uint8_t*)ficIn.getData();
                all_fic.insert(all_fic.end(), p, p + 96);
            }
            ficPrbs.process({&ficIn}, {&t1});
            ficConv.process(&t1, &t2);
            ficPunct.process(&t2, &ficOut);

            std::vector<Buffer> subOut(chains.size());
            for (size_t i = 0; i < chains.size(); i++) {
                Buffer in, a, b, c;
                fill_bytes(in, src.m_subs[i]->framesize());
                const uint8_t* p = (const uint8_t*)in.getData();
                all_sub.insert(all_sub.end(), p, p + in.getLength());
                chains[i]->prbs.process({&in}, {&a});
                chains[i]->conv.process(&a, &b);
                chains[i]->punct.process(&b, &c);
                chains[i]->ti.process(&c, &subOut[i]);
            }

            Buffer filler, cif;
            cifPrbs.process({}, {&filler});
            std::vector<Buffer*> muxIn{&filler};
            for (auto& b : subOut) muxIn.push_back(&b);
            muxer.process(muxIn, &cif);

            std::vector<Buffer*> partIn{&ficOut, &cif};
            int full = part.process(partIn, &tfblock);
            if (full) {
                Buffer mapped, interleaved, ref, symbols;
                map.process(&tfblock, &mapped);
                freq.process(&mapped, &interleaved);
                pref.process(&ref);
                std::vector<Buffer*> diffIn{&ref, &interleaved};
                diff.process(diffIn, &symbols);
                const complexf* p = (const complexf*)symbols.getData();
                all_syms.insert(all_syms.end(),
                                p, p + symbols.getLength() / sizeof(complexf));
            }
        }

        dump("e2e_real_fic_in", "u8", all_fic.data(), all_fic.size(),
             all_fic.size());
        dump("e2e_real_sub_in", "u8", all_sub.data(), all_sub.size(),
             all_sub.size());
        dump("e2e_real_symbols", "c8", all_syms.data(),
             all_syms.size() * sizeof(complexf), all_syms.size());
    }

    // ---- Full-frame fixed-point I/Q: the fft_engine=kiss configuration.
    // TM-I, the same two-sub-channel ensemble, but through the reference's
    // complete fixed-point chain: Q1.14 QPSK/freq-interleave/diff-mod,
    // OfdmGeneratorFixed (KISS int16 IFFT, total scaling 1/2048), fixed
    // GuardIntervalInserter plain and windowed.  The kiss configuration has
    // no GainControl (ref: src/DabModulator.cpp:144-241 fixedPoint
    // branches), so the dump is the raw Q1.14 baseband I/Q. ----
    {
        rng_state = 0xE7037ED1A0B428DBull;   // section-stable fixtures
        FakeEtiSource src;
        src.m_subs.push_back(std::make_shared<SubchannelSource>(0, 24, 0x22));
        src.m_subs.push_back(std::make_shared<SubchannelSource>(48, 48, 0x02));

        PrbsGenerator ficPrbs(96, 0x110);
        ConvEncoder ficConv(96);
        PuncturingEncoder ficPunct;
        FicSource fic(1, 1);
        for (const auto& r : fic.get_rules()) ficPunct.append_rule(r);
        ficPunct.append_tail_rule(PuncturingRule(3, 0xcccccc));

        struct SubChain {
            PrbsGenerator prbs;
            ConvEncoder conv;
            PuncturingEncoder punct;
            TimeInterleaver ti;
            SubChain(size_t fs, size_t cu,
                     const std::vector<PuncturingRule>& rules)
                : prbs(fs, 0x110), conv(fs), punct(cu), ti(cu * 8) {
                for (const auto& r : rules) punct.append_rule(r);
                punct.append_tail_rule(PuncturingRule(3, 0xcccccc));
            }
        };
        std::vector<std::unique_ptr<SubChain>> chains;
        for (auto& s : src.m_subs) {
            chains.emplace_back(std::make_unique<SubChain>(
                s->framesize(), s->framesizeCu(), s->get_rules()));
        }

        PrbsGenerator cifPrbs(864 * 8, 0x110);
        FrameMultiplexer mux(src);
        BlockPartitioner part(1);
        QpskSymbolMapper map(1536, true);
        FrequencyInterleaver freq(1, true);
        PhaseReference pref(1, true);
        DifferentialModulator diff(1536, true);
        OfdmGeneratorFixed ofdm(77, 1536, 2048, true);
        size_t ov0 = 0, ov90 = 90;
        GuardIntervalInserter guard0(76, 2048, 2656, 2552, ov0,
                                     FFTEngine::KISS);
        GuardIntervalInserter guardw(76, 2048, 2656, 2552, ov90,
                                     FFTEngine::KISS);

        std::vector<uint8_t> all_fic, all_sub0, all_sub1;
        std::vector<int16_t> all_syms, all_iq0, all_iqw;
        Buffer tfblock;

        for (int frame = 0; frame < 8; frame++) {
            Buffer ficIn, t1, t2, ficOut;
            fill_bytes(ficIn, 96);
            {
                const uint8_t* p = (const uint8_t*)ficIn.getData();
                all_fic.insert(all_fic.end(), p, p + 96);
            }
            ficPrbs.process({&ficIn}, {&t1});
            ficConv.process(&t1, &t2);
            ficPunct.process(&t2, &ficOut);

            std::vector<Buffer> subOut(chains.size());
            for (size_t i = 0; i < chains.size(); i++) {
                Buffer in, a, b, c;
                fill_bytes(in, src.m_subs[i]->framesize());
                const uint8_t* p = (const uint8_t*)in.getData();
                auto& sink = (i == 0) ? all_sub0 : all_sub1;
                sink.insert(sink.end(), p, p + in.getLength());
                chains[i]->prbs.process({&in}, {&a});
                chains[i]->conv.process(&a, &b);
                chains[i]->punct.process(&b, &c);
                chains[i]->ti.process(&c, &subOut[i]);
            }

            Buffer filler, cif;
            cifPrbs.process({}, {&filler});
            std::vector<Buffer*> muxIn{&filler};
            for (auto& b : subOut) muxIn.push_back(&b);
            mux.process(muxIn, &cif);

            std::vector<Buffer*> partIn{&ficOut, &cif};
            int full = part.process(partIn, &tfblock);
            if (!full) continue;

            Buffer mapped, interleaved, ref, symbols;
            map.process(&tfblock, &mapped);
            freq.process(&mapped, &interleaved);
            pref.process(&ref);
            std::vector<Buffer*> diffIn{&ref, &interleaved};
            diff.process(diffIn, &symbols);
            {
                const int16_t* p = (const int16_t*)symbols.getData();
                all_syms.insert(all_syms.end(), p,
                                p + symbols.getLength() / sizeof(int16_t));
            }

            // SignalMultiplexer: all-zero NULL symbol ahead of the 76 data
            // symbols (no TII)
            Buffer ofdmIn, td;
            ofdmIn.setLength(77 * 1536 * sizeof(complexfix));
            memset(ofdmIn.getData(), 0, 1536 * sizeof(complexfix));
            memcpy((uint8_t*)ofdmIn.getData() + 1536 * sizeof(complexfix),
                   symbols.getData(), symbols.getLength());
            ofdm.process(&ofdmIn, &td);

            Buffer iq0, iqw;
            guard0.process(&td, &iq0);
            {
                const int16_t* p = (const int16_t*)iq0.getData();
                all_iq0.insert(all_iq0.end(), p,
                               p + iq0.getLength() / sizeof(int16_t));
            }
            Buffer td2;     // guardw consumes its input too; give it a copy
            td2.setData(td.getData(), td.getLength());
            guardw.process(&td2, &iqw);
            {
                const int16_t* p = (const int16_t*)iqw.getData();
                all_iqw.insert(all_iqw.end(), p,
                               p + iqw.getLength() / sizeof(int16_t));
            }
        }

        dump("e2e_fixed_fic_in", "u8", all_fic.data(), all_fic.size(),
             all_fic.size());
        dump("e2e_fixed_sub0_in", "u8", all_sub0.data(), all_sub0.size(),
             all_sub0.size());
        dump("e2e_fixed_sub1_in", "u8", all_sub1.data(), all_sub1.size(),
             all_sub1.size());
        dump("e2e_fixed_symbols", "i16", all_syms.data(),
             all_syms.size() * sizeof(int16_t), all_syms.size());
        dump("e2e_iq_fixed", "i16", all_iq0.data(),
             all_iq0.size() * sizeof(int16_t), all_iq0.size());
        dump("e2e_iq_fixed_ov90", "i16", all_iqw.data(),
             all_iqw.size() * sizeof(int16_t), all_iqw.size());
    }

    fclose(g_manifest);
    printf("golden vectors written to %s\n", g_outdir.c_str());
    return 0;
}
