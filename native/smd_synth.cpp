// smd_synth: a small polyphonic additive synthesizer for NoteSequence audio
// rendering.
//
// The reference renders WAVs through the FluidSynth C library via
// note_seq.fluidsynth (reference scripts/sample_audio.py:46,113-120). That
// soundfont stack is unavailable here, so this is the framework's native
// render backend: per-note additive synthesis (program-shaped harmonic
// stack + ADSR envelope, noise bursts for drums), accumulated into a float32
// buffer. CPU-bound DSP — the classic native-code boundary — exposed to
// Python over a C ABI (ctypes).
//
// Build: g++ -O3 -march=native -shared -fPIC smd_synth.cpp -o libsmd_synth.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr float kTwoPi = 6.28318530717958647692f;

// Harmonic amplitude profiles per General-MIDI program family (0-15).
// Index = family (program / 8): piano, chromatic, organ, guitar, bass,
// strings, ensemble, brass, reed, pipe, synth lead, synth pad, synth fx,
// ethnic, percussive, sfx.
const float kHarmonics[16][6] = {
    {1.00f, 0.45f, 0.20f, 0.10f, 0.06f, 0.03f},  // piano
    {1.00f, 0.20f, 0.40f, 0.10f, 0.08f, 0.02f},  // chromatic percussion
    {1.00f, 0.60f, 0.50f, 0.40f, 0.30f, 0.20f},  // organ
    {1.00f, 0.50f, 0.25f, 0.12f, 0.05f, 0.02f},  // guitar
    {1.00f, 0.70f, 0.30f, 0.10f, 0.03f, 0.01f},  // bass
    {1.00f, 0.55f, 0.35f, 0.25f, 0.15f, 0.10f},  // strings
    {1.00f, 0.50f, 0.30f, 0.20f, 0.12f, 0.08f},  // ensemble
    {1.00f, 0.65f, 0.45f, 0.30f, 0.18f, 0.10f},  // brass
    {1.00f, 0.40f, 0.50f, 0.20f, 0.15f, 0.05f},  // reed
    {1.00f, 0.15f, 0.30f, 0.05f, 0.08f, 0.01f},  // pipe
    {1.00f, 0.75f, 0.50f, 0.35f, 0.20f, 0.12f},  // synth lead
    {1.00f, 0.35f, 0.20f, 0.12f, 0.08f, 0.04f},  // synth pad
    {1.00f, 0.45f, 0.35f, 0.25f, 0.15f, 0.08f},  // synth fx
    {1.00f, 0.40f, 0.30f, 0.15f, 0.08f, 0.03f},  // ethnic
    {1.00f, 0.25f, 0.15f, 0.08f, 0.04f, 0.02f},  // percussive
    {1.00f, 0.30f, 0.20f, 0.10f, 0.05f, 0.02f},  // sfx
};

struct Adsr {
  float attack, decay, sustain, release;
};

inline Adsr program_adsr(int program) {
  int family = std::min(std::max(program / 8, 0), 15);
  switch (family) {
    case 0:  return {0.005f, 0.30f, 0.30f, 0.15f};  // piano: percussive
    case 2:  return {0.010f, 0.00f, 1.00f, 0.05f};  // organ: sustained
    case 4:  return {0.008f, 0.20f, 0.50f, 0.10f};  // bass
    case 5:
    case 6:  return {0.060f, 0.10f, 0.80f, 0.25f};  // strings/ensemble
    case 7:  return {0.030f, 0.10f, 0.75f, 0.15f};  // brass
    default: return {0.010f, 0.20f, 0.60f, 0.12f};
  }
}

inline float envelope(float t, float dur, const Adsr& a) {
  if (t < 0) return 0.f;
  float amp;
  if (t < a.attack) {
    amp = t / a.attack;
  } else if (t < a.attack + a.decay) {
    float d = (t - a.attack) / a.decay;
    amp = 1.0f + (a.sustain - 1.0f) * d;
  } else {
    amp = a.sustain;
  }
  // release tail after note end
  if (t > dur) {
    float r = (t - dur) / a.release;
    if (r >= 1.f) return 0.f;
    amp *= 1.0f - r;
  }
  return amp;
}

// Tiny deterministic PRNG for drum noise.
inline float noise(uint32_t& state) {
  state = state * 1664525u + 1013904223u;
  return (static_cast<float>(state >> 9) / 8388608.0f) - 1.0f;
}

}  // namespace

extern "C" {

// Render notes into `out` (mono float32, length n_samples, caller-zeroed or
// not — this function zeroes it first). Returns 0 on success.
int synth_render(const int32_t* pitches, const float* velocities,
                 const float* start_times, const float* end_times,
                 const int32_t* programs, const uint8_t* is_drum,
                 int32_t n_notes, float* out, int64_t n_samples,
                 int32_t sample_rate) {
  std::memset(out, 0, sizeof(float) * static_cast<size_t>(n_samples));
  const float dt = 1.0f / static_cast<float>(sample_rate);

  for (int32_t i = 0; i < n_notes; ++i) {
    const float start = start_times[i];
    const float end = end_times[i];
    if (end <= start) continue;
    const float dur = end - start;
    const float vel = velocities[i] / 127.0f;

    if (is_drum[i]) {
      // Noise burst with pitch-dependent decay (kick vs hat etc.).
      const float decay = pitches[i] < 50 ? 0.12f : 0.05f;
      int64_t s0 = static_cast<int64_t>(start * sample_rate);
      int64_t s1 = std::min<int64_t>(
          n_samples, static_cast<int64_t>((start + 4 * decay) * sample_rate));
      uint32_t rng = 0x9E3779B9u ^ static_cast<uint32_t>(i * 2654435761u);
      const float body_freq = pitches[i] < 50 ? 55.0f : 220.0f;
      for (int64_t s = std::max<int64_t>(s0, 0); s < s1; ++s) {
        float t = (s - s0) * dt;
        float env = std::exp(-t / decay);
        float body = std::sin(kTwoPi * body_freq * t) * 0.5f;
        out[s] += vel * env * (0.6f * noise(rng) + body) * 0.5f;
      }
      continue;
    }

    const float freq = 440.0f * std::pow(2.0f, (pitches[i] - 69) / 12.0f);
    const int family = std::min(std::max(programs[i] / 8, 0), 15);
    const float* h = kHarmonics[family];
    const Adsr adsr = program_adsr(programs[i]);
    const float nyquist = 0.5f * sample_rate;

    int64_t s0 = static_cast<int64_t>(start * sample_rate);
    int64_t s1 = std::min<int64_t>(
        n_samples,
        static_cast<int64_t>((end + adsr.release) * sample_rate) + 1);
    for (int64_t s = std::max<int64_t>(s0, 0); s < s1; ++s) {
      float t = (s - s0) * dt;
      float env = envelope(t, dur, adsr);
      if (env <= 0.f) continue;
      float sample = 0.f;
      for (int k = 0; k < 6; ++k) {
        float f = freq * (k + 1);
        if (f >= nyquist) break;
        sample += h[k] * std::sin(kTwoPi * f * t);
      }
      out[s] += vel * env * sample * 0.12f;
    }
  }

  // Soft clip to [-1, 1].
  for (int64_t s = 0; s < n_samples; ++s) {
    out[s] = std::tanh(out[s]);
  }
  return 0;
}

}  // extern "C"
