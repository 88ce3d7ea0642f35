// Native BPE merge core for the CLIP tokenizer.
//
// The reference tokenizes via transformers' Python BPE inside the pipeline
// (reference: utils.py get_sd_model loads the bundled tokenizer); at eval
// scale (COCO-30k captions, benchmarks/eval_coco.py:157) Python BPE merge
// loops dominate host-side prep. This core does the byte-level BPE merge
// with rank lookups in flat hash maps and a word cache.
//
// Division of labor (set up by data/tokenizer.py):
//   Python: unicode regex word split (the \p{L}/\p{N} pattern), bytes ->
//           byte-unicode mapping, BOS/EOS framing, padding.
//   C++:    per-word merge loop over UTF-8 codepoints, vocab id lookup,
//           word -> ids caching.
//
// C API (ctypes, no pybind11 in this image):
//   void* bpe_create(const char* vocab_blob, const char* merges_blob)
//       vocab_blob:  token strings, one per line, line index == token id
//       merges_blob: "left right" pairs, one per line, line order == rank
//   int bpe_encode_word(void* h, const char* word_utf8,
//                       int32_t* out, int out_cap)
//       word_utf8: byte-unicode form of one word WITHOUT the </w> suffix
//       (appended internally to the last codepoint). Returns the number of
//       ids written, 0 if none of the pieces are in the vocab, -1 overflow.
//   void bpe_destroy(void* h)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, int32_t> ranks;  // "left\x01right" -> rank
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

std::vector<std::string> split_lines(const char* blob) {
  std::vector<std::string> out;
  const char* p = blob;
  while (*p) {
    const char* nl = std::strchr(p, '\n');
    if (!nl) { out.emplace_back(p); break; }
    out.emplace_back(p, nl - p);
    p = nl + 1;
  }
  return out;
}

// Split a UTF-8 string into codepoint-granular chunks.
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    if (i + len > s.size()) len = 1;  // tolerate malformed tails
    out.emplace_back(s.substr(i, len));
    i += len;
  }
  return out;
}

}  // namespace

extern "C" {

void* bpe_create(const char* vocab_blob, const char* merges_blob) {
  auto* h = new Bpe();
  int32_t id = 0;
  for (auto& line : split_lines(vocab_blob)) h->vocab.emplace(line, id++);
  int32_t rank = 0;
  for (auto& line : split_lines(merges_blob)) {
    size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    h->ranks.emplace(line.substr(0, sp) + '\x01' + line.substr(sp + 1),
                     rank++);
  }
  return h;
}

void bpe_destroy(void* handle) { delete static_cast<Bpe*>(handle); }

int bpe_encode_word(void* handle, const char* word_utf8, int32_t* out,
                    int out_cap) {
  auto* h = static_cast<Bpe*>(handle);
  std::string key(word_utf8);
  auto hit = h->cache.find(key);
  if (hit == h->cache.end()) {
    std::vector<std::string> word = utf8_chars(key);
    if (word.empty()) return 0;
    word.back() += "</w>";
    // merge loop: repeatedly fuse the lowest-rank adjacent pair
    while (word.size() > 1) {
      int best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto it = h->ranks.find(word[i] + '\x01' + word[i + 1]);
        if (it != h->ranks.end() && it->second < best_rank) {
          best_rank = it->second;
          best_i = i;
        }
      }
      if (best_rank == INT32_MAX) break;
      // merge EVERY occurrence of the best pair left-to-right (BPE spec)
      std::vector<std::string> merged;
      merged.reserve(word.size());
      for (size_t i = 0; i < word.size();) {
        if (i + 1 < word.size() &&
            h->ranks.count(word[i] + '\x01' + word[i + 1]) &&
            h->ranks.at(word[i] + '\x01' + word[i + 1]) == best_rank) {
          merged.emplace_back(word[i] + word[i + 1]);
          i += 2;
        } else {
          merged.emplace_back(word[i]);
          i += 1;
        }
      }
      word.swap(merged);
    }
    std::vector<int32_t> ids;
    ids.reserve(word.size());
    for (auto& piece : word) {
      auto it = h->vocab.find(piece);
      if (it != h->vocab.end()) ids.push_back(it->second);
    }
    hit = h->cache.emplace(std::move(key), std::move(ids)).first;
  }
  const auto& ids = hit->second;
  if ((int)ids.size() > out_cap) return -1;
  std::memcpy(out, ids.data(), ids.size() * sizeof(int32_t));
  return (int)ids.size();
}

}  // extern "C"
