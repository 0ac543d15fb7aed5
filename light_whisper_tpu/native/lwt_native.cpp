// Native host-side runtime for light_whisper_tpu.
//
// The reference delegates its host hot paths to native code (kaldi fbank,
// onnxruntime, the GGUF runtime); in the TPU build the accelerator owns the
// DSP/model math, and this library covers the remaining per-tick host work
// where Python overhead is measurable:
//
//   - linear resampling of interim audio deltas (reference resamples every
//     140-460 ms tick, qwen3_asr_server.py:230-243 semantics)
//   - VAD probability smoothing + hysteresis segmentation
//     (firered_vad.py:121-191 semantics; called once per utterance/tick)
//   - Levenshtein distance for hot-word biasing (p95 < 1 ms contract,
//     qwen_hotword_service.rs:780-798)
//
// Build: g++ -O2 -shared -fPIC -o liblwt_native.so lwt_native.cpp
// Python binding: ctypes (light_whisper_tpu/native/binding.py), with pure
// numpy fallbacks when the library is absent.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Linear-interpolation resample matching numpy.interp over
// linspace(0, n_in-1, n_out): out[i] = lerp(audio, i*(n_in-1)/(n_out-1)).
void lwt_resample_linear(const float* in, int64_t n_in, float* out, int64_t n_out) {
    if (n_out <= 0) return;
    if (n_in <= 0) {
        std::memset(out, 0, sizeof(float) * static_cast<size_t>(n_out));
        return;
    }
    if (n_in == 1 || n_out == 1) {
        for (int64_t i = 0; i < n_out; ++i) out[i] = in[0];
        return;
    }
    const double step = static_cast<double>(n_in - 1) / static_cast<double>(n_out - 1);
    for (int64_t i = 0; i < n_out; ++i) {
        const double pos = static_cast<double>(i) * step;
        int64_t idx = static_cast<int64_t>(pos);
        if (idx >= n_in - 1) {
            out[i] = in[n_in - 1];
            continue;
        }
        const double frac = pos - static_cast<double>(idx);
        out[i] = static_cast<float>(in[idx] + (in[idx + 1] - in[idx]) * frac);
    }
}

// int16 little-endian PCM -> float32 / 32768.
void lwt_pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(in[i]) / 32768.0f;
}

// Trailing moving average with cumulative-mean warmup (window-1 leading
// entries), as in the reference smoother.
void lwt_smooth_probs(const float* probs, int64_t n, int window, float* out) {
    if (n <= 0) return;
    if (window < 1) window = 1;
    if (window == 1) {
        std::memcpy(out, probs, sizeof(float) * static_cast<size_t>(n));
        return;
    }
    double running = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        running += probs[i];
        if (i >= window) running -= probs[i - window];
        if (i < window - 1) {
            out[i] = static_cast<float>(running / static_cast<double>(i + 1));
        } else {
            out[i] = static_cast<float>(running / static_cast<double>(window));
        }
    }
}

// Hysteresis segmentation. Returns segment count; writes up to max_segments
// (start, end) sample pairs. Parameters mirror FireRedVadOptions.
int64_t lwt_vad_segments(
    const float* probs,
    int64_t n_frames,
    int64_t audio_len_samples,
    float threshold,
    int smooth_window,
    int min_speech_ms,
    int min_silence_ms,
    int pad_ms,
    int64_t* out_pairs,
    int64_t max_segments) {
    if (n_frames <= 0 || max_segments <= 0) return 0;

    std::vector<float> smoothed(static_cast<size_t>(n_frames));
    lwt_smooth_probs(probs, n_frames, smooth_window, smoothed.data());

    const int64_t frame_shift = 160;  // 10 ms at 16 kHz
    const int64_t min_speech = std::max<int64_t>(1, min_speech_ms / 10);
    const int64_t min_silence = std::max<int64_t>(1, min_silence_ms / 10);
    const int64_t pad = std::max<int64_t>(0, static_cast<int64_t>(pad_ms) * 16000 / 1000);

    std::vector<std::pair<int64_t, int64_t>> raw;
    int64_t run_start = -1;    // candidate speech-run start
    int64_t active_start = -1; // open segment start
    int64_t gap_start = -1;    // silence-run start inside a segment

    for (int64_t frame = 0; frame < n_frames; ++frame) {
        const bool speech = smoothed[static_cast<size_t>(frame)] >= threshold;
        if (active_start < 0) {
            if (speech) {
                if (run_start < 0) run_start = frame;
                if (frame - run_start + 1 >= min_speech) {
                    active_start = run_start;
                    gap_start = -1;
                }
            } else {
                run_start = -1;
            }
        } else if (speech) {
            gap_start = -1;
        } else if (gap_start < 0) {
            gap_start = frame;
        } else if (frame - gap_start + 1 >= min_silence) {
            raw.emplace_back(active_start, gap_start);
            active_start = -1;
            run_start = -1;
            gap_start = -1;
        }
    }
    if (active_start >= 0) raw.emplace_back(active_start, n_frames);

    int64_t count = 0;
    for (const auto& seg : raw) {
        int64_t start = std::max<int64_t>(0, seg.first * frame_shift - pad);
        int64_t end = std::min<int64_t>(audio_len_samples, seg.second * frame_shift + pad);
        if (end <= start) continue;
        if (count > 0 && start <= out_pairs[2 * (count - 1) + 1]) {
            out_pairs[2 * (count - 1) + 1] =
                std::max(out_pairs[2 * (count - 1) + 1], end);
        } else {
            if (count >= max_segments) break;
            out_pairs[2 * count] = start;
            out_pairs[2 * count + 1] = end;
            ++count;
        }
    }
    return count;
}

// Depthwise FIR over row-major [n + taps - 1, C] float32 activations with a
// [taps, C] per-channel kernel: out[t][c] = Σ_j span[t+j][c] · filt[j][c].
// The DFSMN streaming VAD's memory blocks (20-tap lookback + 20-tap
// lookahead, C=128; models/vad/streaming.py) run this every interim tick on
// the 1-core serving host — the numpy shifted-FMA loop pays a [n, C]
// temporary per tap (~22 ms/tick); this single pass is bound by the FMA
// throughput of one core (~1 ms). Reference cost center: firered_vad.py's
// onnxruntime CPU threads.
void lwt_fir_rows(
    const float* span,
    int64_t n,
    int64_t taps,
    int64_t C,
    const float* filt,
    float* out) {
    for (int64_t t = 0; t < n; ++t) {
        float* o = out + t * C;
        std::memset(o, 0, static_cast<size_t>(C) * sizeof(float));
        for (int64_t j = 0; j < taps; ++j) {
            const float* s = span + (t + j) * C;
            const float* f = filt + j * C;
            for (int64_t c = 0; c < C; ++c) {
                o[c] += s[c] * f[c];
            }
        }
    }
}

// Byte-wise Levenshtein distance (UTF-8 normalized inputs are ASCII-only in
// the hot-word path, where byte == char).
int64_t lwt_levenshtein(const uint8_t* left, int64_t n_left, const uint8_t* right, int64_t n_right) {
    std::vector<int64_t> prev(static_cast<size_t>(n_right) + 1);
    std::vector<int64_t> curr(static_cast<size_t>(n_right) + 1);
    for (int64_t j = 0; j <= n_right; ++j) prev[static_cast<size_t>(j)] = j;
    for (int64_t i = 0; i < n_left; ++i) {
        curr[0] = i + 1;
        for (int64_t j = 0; j < n_right; ++j) {
            const int64_t sub = prev[static_cast<size_t>(j)] + (left[i] != right[j] ? 1 : 0);
            curr[static_cast<size_t>(j) + 1] =
                std::min({prev[static_cast<size_t>(j) + 1] + 1, curr[static_cast<size_t>(j)] + 1, sub});
        }
        std::swap(prev, curr);
    }
    return prev[static_cast<size_t>(n_right)];
}

}  // extern "C"
