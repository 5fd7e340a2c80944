// Native INFO-format config parser.
//
// C++ counterpart of the reference's Boost.property_tree ParameterServer
// (scpp_core/utils/include/parameterServer.hpp:34-128): parses the INFO
// subset used by SCpp configs (key/value pairs, brace-nested blocks, ';'
// comments) and flattens to "dotted.path=value" lines for the Python layer.
//
// C ABI (ctypes):
//   long scpp_parse_info(const char* path, char* out, long out_cap)
//     returns the number of bytes written (excluding NUL), or -1 on error;
//     `out` receives newline-separated "key=value" entries where nested
//     keys are joined with '.' (element keys like "(0)" kept verbatim).

#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Token {
  enum Kind { STR, OPEN, CLOSE, NEWLINE } kind;
  std::string text;
};

std::vector<Token> tokenize(const std::string& text) {
  std::vector<Token> toks;
  std::string cur;
  bool in_quote = false;
  auto flush = [&]() {
    if (!cur.empty()) {
      toks.push_back({Token::STR, cur});
      cur.clear();
    }
  };
  for (size_t i = 0; i < text.size(); ++i) {
    char ch = text[i];
    if (ch == '"') {
      in_quote = !in_quote;
      continue;
    }
    if (!in_quote && ch == ';') {  // comment to end of line
      while (i < text.size() && text[i] != '\n') ++i;
      ch = '\n';
    }
    if (ch == '\n') {
      flush();
      toks.push_back({Token::NEWLINE, ""});
    } else if (!in_quote && (ch == '{' || ch == '}')) {
      flush();
      toks.push_back({ch == '{' ? Token::OPEN : Token::CLOSE, ""});
    } else if (!in_quote && (ch == ' ' || ch == '\t' || ch == '\r')) {
      flush();
    } else {
      cur.push_back(ch);
    }
  }
  flush();
  toks.push_back({Token::NEWLINE, ""});
  return toks;
}

bool next_is_open(const std::vector<Token>& toks, size_t pos) {
  for (size_t j = pos; j < toks.size(); ++j) {
    if (toks[j].kind == Token::NEWLINE) continue;
    return toks[j].kind == Token::OPEN;
  }
  return false;
}

}  // namespace

extern "C" long scpp_parse_info(const char* path, char* out, long out_cap) {
  std::ifstream f(path);
  if (!f) return -1;
  std::stringstream ss;
  ss << f.rdbuf();
  const std::vector<Token> toks = tokenize(ss.str());

  std::string result;
  std::vector<std::string> stack;
  std::string pending;
  bool have_pending = false;

  auto prefix = [&]() {
    std::string p;
    for (const auto& s : stack) {
      p += s;
      p += '.';
    }
    return p;
  };
  auto emit = [&](const std::string& key, const std::string& value) {
    result += prefix() + key + "=" + value + "\n";
  };

  for (size_t i = 0; i < toks.size(); ++i) {
    const Token& tk = toks[i];
    switch (tk.kind) {
      case Token::STR:
        if (!have_pending) {
          pending = tk.text;
          have_pending = true;
        } else {
          emit(pending, tk.text);
          have_pending = false;
        }
        break;
      case Token::OPEN:
        if (!have_pending) return -1;  // block without key
        stack.push_back(pending);
        have_pending = false;
        break;
      case Token::CLOSE:
        if (have_pending) {
          emit(pending, "");
          have_pending = false;
        }
        if (stack.empty()) return -1;  // unbalanced
        stack.pop_back();
        break;
      case Token::NEWLINE:
        if (have_pending && !next_is_open(toks, i + 1)) {
          emit(pending, "");
          have_pending = false;
        }
        break;
    }
  }
  if (!stack.empty()) return -1;  // unbalanced open

  const long nbytes = static_cast<long>(result.size());
  if (out && out_cap > nbytes) {
    std::memcpy(out, result.data(), nbytes);
    out[nbytes] = '\0';
  }
  return nbytes;
}
