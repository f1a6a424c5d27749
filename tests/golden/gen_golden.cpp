// Golden-vector generator: links the UNMODIFIED reference kernels
// (/root/reference/src/Kernels/{default,AVX-SSE}) and records their exact
// scores and tracebacks to JSON. The JSON (not this build) is the artifact
// consumed by tests/test_golden.py to pin bit-identical parity.
//
// Scores are taken from the SSE kernel (the Default kernel's score path has
// the memset-low-byte bug, DefaultKernel.cpp:137). Alignments are recorded
// from BOTH kernels since their tie-breaks differ (Default: DIAG>UP>LEFT,
// SSE: DIAG>LEFT>UP).
//
// Build/run: tests/golden/generate.sh

#include "AlignmentKernel.h"
#include "AlignmentParameters.h"
#include "AlignmentLogger.h"
#include "DefaultKernel.h"
#include "SSEKernel.h"

#include <cstdarg>
#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <vector>

// --- plugin-global injection points (normally in *_dllexport.cpp) ----------
AlignmentParameters *_parameters = 0;
AlignmentLogger *_logger = 0;

struct Params : AlignmentParameters {
  std::map<std::string, int> kv;
  int param_int(char const *const key) override { return kv.at(key); }
  bool has_key(char const *const key) override { return kv.count(key) > 0; }
};

struct NullLogger : AlignmentLogger {
  void log(int const, char const *const, char const *const, size_t const &,
           ...) override {}
};

// --- deterministic LCG -----------------------------------------------------
static unsigned long long lcg_state = 0x243F6A8885A308D3ull;
static unsigned lcg() {
  lcg_state = lcg_state * 6364136223846793005ull + 1442695040888963407ull;
  return (unsigned)(lcg_state >> 33);
}

static std::string random_seq(int len, bool with_n, bool with_lower,
                              bool padded) {
  static const char bases[] = "ACGT";
  std::string s(len, 'A');
  int valid_len = len;
  if (padded && len > 1) valid_len = 1 + (int)(lcg() % (unsigned)len);
  for (int i = 0; i < len; ++i) {
    if (i >= valid_len) {
      s[i] = '_';  // '_' encodes '\0' in the JSON
      continue;
    }
    char c = bases[lcg() % 4];
    if (with_n && lcg() % 10 == 0) c = 'N';
    if (with_lower && lcg() % 3 == 0) c = (char)(c + 32);
    s[i] = c;
  }
  return s;
}

static std::string to_kernel(const std::string &s) {
  std::string out = s;
  for (auto &c : out)
    if (c == '_') c = '\0';
  return out;
}

static std::string from_buffer(const char *buf, int len) {
  std::string out(buf, buf + len);
  for (auto &c : out)
    if (c == '\0') c = '_';
  return out;
}

struct Case {
  std::string read, ref;
};

static void json_str(FILE *f, const char *key, const std::string &v,
                     bool comma = true) {
  fprintf(f, "\"%s\": \"%s\"%s", key, v.c_str(), comma ? ", " : "");
}

int main(int argc, char **argv) {
  const char *out_path = argc > 1 ? argv[1] : "golden.json";
  FILE *f = fopen(out_path, "w");
  if (!f) return 1;

  NullLogger logger;
  _logger = &logger;

  struct ParamSet {
    int match, mismatch, gap_read, gap_ref;
  };
  std::vector<ParamSet> param_sets = {
      {2, -1, -3, -3},  // reference defaults (CustomParameters.h:55-58)
      {3, -2, -1, -2},
      {1, -4, -5, -1},
  };

  struct Config {
    int read_len, ref_len, n;
    bool with_n, with_lower, padded;
    bool alignments;  // record tracebacks too
  };
  std::vector<Config> configs = {
      {12, 12, 24, false, false, false, true},
      {16, 24, 24, true, true, true, true},
      {33, 17, 24, true, false, true, true},
      {64, 64, 16, false, false, false, true},
      {100, 100, 8, true, false, true, true},
      {512, 512, 8, false, false, false, false},
      {512, 512, 4, true, false, true, false},
      {256, 512, 4, false, false, true, false},
  };

  fprintf(f, "[\n");
  bool first_entry = true;

  for (auto &ps : param_sets) {
    for (auto &cfg : configs) {
      Params params;
      params.kv = {{"score_match", ps.match},
                   {"score_mismatch", ps.mismatch},
                   {"score_gap_read", ps.gap_read},
                   {"score_gap_ref", ps.gap_ref},
                   {"read_length", cfg.read_len},
                   {"ref_length", cfg.ref_len},
                   {"num_threads", 1}};
      _parameters = &params;

      std::vector<Case> cases;
      for (int i = 0; i < cfg.n; ++i)
        cases.push_back({random_seq(cfg.read_len, cfg.with_n, cfg.with_lower,
                                    cfg.padded),
                         random_seq(cfg.ref_len, cfg.with_n, cfg.with_lower,
                                    cfg.padded)});

      std::vector<std::string> reads_k, refs_k;
      std::vector<const char *> reads_p, refs_p;
      for (auto &c : cases) {
        reads_k.push_back(to_kernel(c.read));
        refs_k.push_back(to_kernel(c.ref));
      }
      for (size_t i = 0; i < cases.size(); ++i) {
        reads_p.push_back(reads_k[i].data());
        refs_p.push_back(refs_k[i].data());
      }
      int n = (int)cases.size();
      int aln_length = cfg.read_len + cfg.ref_len;

      SSEKernel sse;
      DefaultKernel dflt;

      for (int opt = 0; opt <= 1; ++opt) {
        std::vector<short> scores(n, 0);
        sse.score_alignments(opt, n, reads_p.data(), refs_p.data(),
                             scores.data());

        std::vector<Alignment> aln_default(n), aln_sse(n);
        if (cfg.alignments) {
          dflt.compute_alignments(opt, n, reads_p.data(), refs_p.data(),
                                  aln_default.data());
          sse.compute_alignments(opt, n, reads_p.data(), refs_p.data(),
                                 aln_sse.data());
        }

        for (int i = 0; i < n; ++i) {
          if (!first_entry) fprintf(f, ",\n");
          first_entry = false;
          fprintf(f, "{");
          fprintf(f, "\"match\": %d, \"mismatch\": %d, \"gap_read\": %d, "
                     "\"gap_ref\": %d, \"opt\": %d, ",
                  ps.match, ps.mismatch, ps.gap_read, ps.gap_ref, opt);
          json_str(f, "read", cases[i].read);
          json_str(f, "ref", cases[i].ref);
          fprintf(f, "\"score\": %d", (int)scores[i]);
          if (cfg.alignments) {
            const Alignment &ad = aln_default[i];
            int seg_len = (aln_length - 1) - ad.readStart;
            fprintf(f, ", ");
            json_str(f, "default_read",
                     from_buffer(ad.read + ad.readStart, seg_len));
            json_str(f, "default_ref",
                     from_buffer(ad.ref + ad.refStart, seg_len));
            fprintf(f, "\"default_start\": %d, ", (int)ad.readStart);
            const Alignment &as = aln_sse[i];
            int seg_len_s = (aln_length - 1) - as.readStart;
            json_str(f, "sse_read",
                     from_buffer(as.read + as.readStart, seg_len_s));
            json_str(f, "sse_ref",
                     from_buffer(as.ref + as.refStart, seg_len_s));
            fprintf(f, "\"sse_start\": %d", (int)as.readStart);
          }
          fprintf(f, "}");
        }
      }
      _parameters = 0;
    }
  }
  fprintf(f, "\n]\n");
  fclose(f);
  return 0;
}
