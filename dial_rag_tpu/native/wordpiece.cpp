// Fast BERT basic+WordPiece tokenizer (C core).
//
// The reference's tokenization runs inside sentence-transformers (Rust
// tokenizers); our Python implementation is exact but the per-character
// loop dominates index-build time on host. This C++ core implements the
// identical algorithm for pure-ASCII text (the overwhelming case for
// English corpora); any text containing non-ASCII bytes is rejected with
// -1 and handled by the Python implementation, keeping byte-exact parity
// (enforced by tests/test_native_tokenizer.py).
//
// C ABI only (loaded via ctypes; pybind11 is not in the image).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int> vocab;
  int unk_id = 0;
  size_t max_word_chars = 100;
};

inline bool is_ascii_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b ||
         c == 0x0c;
}

inline bool is_ascii_control(unsigned char c) {
  // matches Python's unicodedata Cc category for ASCII minus \t\n\r,
  // plus DEL
  if (c == '\t' || c == '\n' || c == '\r') return false;
  return c < 0x20 || c == 0x7f;
}

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Greedy longest-match WordPiece for one lowercased word. Appends ids.
void wordpiece(const Tokenizer& tok, const std::string& word,
               std::vector<int>* out) {
  if (word.size() > tok.max_word_chars) {
    out->push_back(tok.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int> pieces;
  std::string buf;
  while (start < word.size()) {
    size_t end = word.size();
    int found = -1;
    while (start < end) {
      buf.clear();
      if (start > 0) buf = "##";
      buf.append(word, start, end - start);
      auto it = tok.vocab.find(buf);
      if (it != tok.vocab.end()) {
        found = it->second;
        break;
      }
      --end;
    }
    if (found < 0) {
      out->push_back(tok.unk_id);
      return;
    }
    pieces.push_back(found);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

// vocab_blob: '\n'-separated tokens, id = line index.
void* wp_create(const char* vocab_blob, int blob_len, int unk_id) {
  auto* tok = new Tokenizer();
  tok->unk_id = unk_id;
  int id = 0;
  const char* p = vocab_blob;
  const char* end = vocab_blob + blob_len;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    size_t len = nl ? static_cast<size_t>(nl - p) : static_cast<size_t>(end - p);
    tok->vocab.emplace(std::string(p, len), id++);
    if (!nl) break;
    p = nl + 1;
  }
  return tok;
}

void wp_free(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Tokenize pure-ASCII text. Returns the number of ids written, or
// -1 if the text contains non-ASCII bytes (caller falls back to Python),
// or -2 if out_capacity was too small.
int wp_encode(void* handle, const char* text, int text_len, int* out_ids,
              int out_capacity) {
  const Tokenizer& tok = *static_cast<Tokenizer*>(handle);
  // reject non-ASCII up front (parity falls back to Python)
  for (int i = 0; i < text_len; ++i) {
    if (static_cast<unsigned char>(text[i]) >= 0x80) return -1;
  }

  std::vector<int> ids;
  ids.reserve(text_len / 4 + 8);
  std::string word;
  word.reserve(64);

  auto flush_word = [&]() {
    if (!word.empty()) {
      wordpiece(tok, word, &ids);
      word.clear();
    }
  };

  for (int i = 0; i < text_len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c == 0 || is_ascii_control(c)) continue;
    if (is_ascii_ws(c)) {
      flush_word();
      continue;
    }
    if (is_ascii_punct(c)) {
      flush_word();
      word.push_back(static_cast<char>(c));
      flush_word();
      continue;
    }
    // lowercase ASCII letters
    if (c >= 'A' && c <= 'Z') c += 32;
    word.push_back(static_cast<char>(c));
  }
  flush_word();

  if (static_cast<int>(ids.size()) > out_capacity) return -2;
  memcpy(out_ids, ids.data(), ids.size() * sizeof(int));
  return static_cast<int>(ids.size());
}

}  // extern "C"
