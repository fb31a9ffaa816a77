// ldtok: BERT WordPiece tokenizer (cased), native replacement for the
// Python-side transformers.BertTokenizer on the serving hot path and in
// prepro (reference tokenizes with that class: uniter_model/prepro.py:25-43
// and dvl/utils.py:205-208 pay it per query).
//
// Reproduces BertTokenizer(do_lower_case=False) exactly:
//   1. clean: drop U+0000/U+FFFD/category-C* (except \t\n\r); map
//      whitespace (" \t\n\r" + category Zs) to ' '
//   2. CJK chars get surrounding spaces (fixed ranges)
//   3. split on spaces; special tokens pass through whole
//   4. split each token at punctuation (ASCII blocks 33-47/58-64/91-96/
//      123-126 + category P*), punctuation chars become single tokens
//   5. WordPiece: greedy longest-prefix match against the vocab,
//      continuations carry the "##" prefix; words longer than 100
//      codepoints or with an unmatchable prefix -> [UNK]
//
// Lower-casing (uncased vocabs) needs full Unicode case folding + NFD —
// that path stays in Python (data/tokenizer.py falls back).
//
// Unicode category tables are generated into ldtok_tables.h by
// scripts/gen_unicode_tables.py from the same unicodedata the golden tests
// compare against.

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "ldtok_tables.h"

namespace {

bool in_table(const uint32_t (*table)[2], size_t n, uint32_t cp) {
  size_t lo = 0, hi = n;
  while (lo < hi) {
    const size_t mid = (lo + hi) / 2;
    if (cp < table[mid][0]) {
      hi = mid;
    } else if (cp > table[mid][1]) {
      lo = mid + 1;
    } else {
      return true;
    }
  }
  return false;
}

bool is_whitespace(uint32_t cp) {
  if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') return true;
  // U+2028/29 (Zl/Zp): python str.split() in HF's whitespace_tokenize
  // splits on them even though _clean_text keeps them
  if (cp == 0x2028 || cp == 0x2029) return true;
  return in_table(kCatZs, kCatZs_len, cp);
}

bool is_control(uint32_t cp) {
  if (cp == '\t' || cp == '\n' || cp == '\r') return false;
  return in_table(kCatC, kCatC_len, cp);
}

bool is_punct(uint32_t cp) {
  if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126))
    return true;
  return in_table(kCatP, kCatP_len, cp);
}

// BasicTokenizer._is_chinese_char ranges (transformers, fixed list)
bool is_cjk(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) ||
         (cp >= 0x2A700 && cp <= 0x2B73F) ||
         (cp >= 0x2B740 && cp <= 0x2B81F) ||
         (cp >= 0x2B820 && cp <= 0x2CEAF) ||
         (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

// decode one UTF-8 codepoint at s[i]; advances i. Invalid bytes decode as
// U+FFFD and advance by one (python handles these before they reach us —
// this is belt-and-braces for raw corpus bytes).
uint32_t decode(const std::string& s, size_t& i) {
  const unsigned char c = s[i];
  uint32_t cp;
  size_t extra;
  if (c < 0x80) {
    cp = c;
    extra = 0;
  } else if ((c >> 5) == 0x6) {
    cp = c & 0x1F;
    extra = 1;
  } else if ((c >> 4) == 0xE) {
    cp = c & 0x0F;
    extra = 2;
  } else if ((c >> 3) == 0x1E) {
    cp = c & 0x07;
    extra = 3;
  } else {
    ++i;
    return 0xFFFD;
  }
  if (i + extra >= s.size()) {  // truncated multi-byte tail
    ++i;
    return 0xFFFD;
  }
  for (size_t k = 1; k <= extra; ++k) {
    const unsigned char cc = s[i + k];
    if ((cc >> 6) != 0x2) {
      ++i;
      return 0xFFFD;
    }
    cp = (cp << 6) | (cc & 0x3F);
  }
  i += extra + 1;
  return cp;
}

void encode_utf8(uint32_t cp, std::string& out) {
  if (cp < 0x80) {
    out.push_back((char)cp);
  } else if (cp < 0x800) {
    out.push_back((char)(0xC0 | (cp >> 6)));
    out.push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out.push_back((char)(0xE0 | (cp >> 12)));
    out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    out.push_back((char)(0xF0 | (cp >> 18)));
    out.push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back((char)(0x80 | (cp & 0x3F)));
  }
}

struct Tok {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = -1;
  std::vector<std::string> specials;  // never-split (the 5 BERT specials)

  // greedy longest-match WordPiece on one word (a span of codepoints,
  // re-encoded to utf-8). Appends ids; [UNK] on failure/overlength.
  void wordpiece(const std::vector<uint32_t>& cps, size_t lo, size_t hi,
                 std::vector<int32_t>& out) const {
    if (hi <= lo) return;
    if (hi - lo > 100) {  // max_input_chars_per_word
      out.push_back(unk_id);
      return;
    }
    // byte offsets of each codepoint within the re-encoded word
    std::string word;
    std::vector<size_t> starts;
    for (size_t k = lo; k < hi; ++k) {
      starts.push_back(word.size());
      encode_utf8(cps[k], word);
    }
    starts.push_back(word.size());

    std::vector<int32_t> ids;
    size_t start = 0;  // codepoint index
    const size_t n = hi - lo;
    while (start < n) {
      size_t end = n;
      int32_t cur = -1;
      while (start < end) {
        std::string sub = word.substr(starts[start],
                                      starts[end] - starts[start]);
        if (start > 0) sub = "##" + sub;
        auto it = vocab.find(sub);
        if (it != vocab.end()) {
          cur = it->second;
          break;
        }
        --end;
      }
      if (cur < 0) {  // is_bad: the whole word becomes [UNK]
        out.push_back(unk_id);
        return;
      }
      ids.push_back(cur);
      start = end;
    }
    out.insert(out.end(), ids.begin(), ids.end());
  }

  // encode with per-id word-start flags (1 = this id begins a new
  // whitespace-delimited word) — the reconstructable per-word protocol of
  // prepro (uniter_model/prepro.py:25-43) in one call. ws == nullptr
  // degrades to plain encode.
  int encode(const char* text, int32_t* out, uint8_t* ws, int cap) const {
    const std::string s(text);
    // pass 1: clean + CJK spacing into a codepoint stream. `real` marks
    // separators that came from actual input whitespace — CJK-inserted
    // spaces split tokens for wordpiece but do NOT start a new word in
    // the reconstructable per-word protocol (prepro splits the RAW text).
    std::vector<uint32_t> cps;
    std::vector<uint8_t> real;
    cps.reserve(s.size());
    real.reserve(s.size());
    size_t i = 0;
    while (i < s.size()) {
      uint32_t cp = decode(s, i);
      if (cp == 0 || cp == 0xFFFD || is_control(cp)) continue;
      if (is_cjk(cp)) {
        cps.push_back(' ');
        real.push_back(0);
        cps.push_back(cp);
        real.push_back(1);
        cps.push_back(' ');
        real.push_back(0);
        continue;
      }
      cps.push_back(is_whitespace(cp) ? ' ' : cp);
      real.push_back(1);
    }
    std::vector<int32_t> ids;
    std::vector<uint8_t> starts;
    // pass 2: space-split -> special passthrough / punct split -> wordpiece
    size_t lo = 0;
    const size_t n = cps.size();
    bool new_word = true;
    while (lo < n) {
      while (lo < n && cps[lo] == ' ') {
        if (real[lo]) new_word = true;
        ++lo;
      }
      size_t hi = lo;
      while (hi < n && cps[hi] != ' ') ++hi;
      if (hi > lo) {
        const size_t before = ids.size();
        // special tokens (e.g. [CLS]) pass through unsplit
        std::string token;
        for (size_t k = lo; k < hi; ++k) encode_utf8(cps[k], token);
        bool special = false;
        for (const auto& sp : specials) {
          if (token == sp) {
            auto it = vocab.find(sp);
            ids.push_back(it != vocab.end() ? it->second : unk_id);
            special = true;
            break;
          }
        }
        if (!special) {
          size_t a = lo;
          for (size_t k = lo; k <= hi; ++k) {
            if (k == hi || is_punct(cps[k])) {
              wordpiece(cps, a, k, ids);  // word chunk before the punct
              if (k < hi) {
                // the punctuation char is its own token
                std::string p;
                encode_utf8(cps[k], p);
                auto it = vocab.find(p);
                ids.push_back(it != vocab.end() ? it->second : unk_id);
              }
              a = k + 1;
            }
          }
        }
        if (ids.size() > before) {
          starts.resize(ids.size(), 0);
          starts[before] = new_word ? 1 : 0;
          new_word = false;
        }
      }
      lo = hi;
    }
    const int m = (int)ids.size() < cap ? (int)ids.size() : cap;
    std::memcpy(out, ids.data(), m * sizeof(int32_t));
    if (ws != nullptr && m > 0) std::memcpy(ws, starts.data(), m);
    return (int)ids.size();  // caller re-calls with a bigger buffer if > cap
  }
};

}  // namespace

extern "C" {

// vocab file: one token per line (HF vocab.txt format), id = line number
void* ldtok_new(const char* vocab_path) {
  std::ifstream f(vocab_path);
  if (!f) return nullptr;
  Tok* t = new Tok();
  std::string line;
  int32_t id = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    // assignment, not emplace: a duplicated vocab line must map to its
    // LAST id, matching HF load_vocab / data/tokenizer.py
    t->vocab[line] = id++;
  }
  if (t->vocab.empty()) {
    delete t;
    return nullptr;
  }
  auto it = t->vocab.find("[UNK]");
  t->unk_id = it != t->vocab.end() ? it->second : 0;
  for (const char* sp :
       {"[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"}) {
    if (t->vocab.count(sp)) t->specials.push_back(sp);
  }
  return t;
}

void ldtok_free(void* h) { delete static_cast<Tok*>(h); }

// Returns the total number of ids produced (may exceed cap; only the first
// min(n, cap) are written — re-call with a larger buffer to get the rest).
int ldtok_encode(void* h, const char* text, int32_t* out, int cap) {
  return static_cast<Tok*>(h)->encode(text, out, nullptr, cap);
}

// encode + per-id word-start flags (prepro's reconstructable protocol)
int ldtok_encode_words(void* h, const char* text, int32_t* out, uint8_t* ws,
                       int cap) {
  return static_cast<Tok*>(h)->encode(text, out, ws, cap);
}

}  // extern "C"
