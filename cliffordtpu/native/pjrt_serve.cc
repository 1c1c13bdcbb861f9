// pjrt_serve — native (C++17) PJRT serving host for exported bundles.
//
// The reference has no deployment story (models live and die inside the
// runner process — SURVEY.md §2); the framework's serving path is
// ahead-of-time export (`cliffordtpu/serving.py`).  This host closes the
// loop: it executes an exported bundle's `*.native.<platform>.stablehlo`
// modules against ANY PJRT plugin (e.g. /opt/axon/libaxon_pjrt.so for
// the TPU, or the mock plugin in pjrt_mock_plugin.cc for tests) with no
// Python anywhere in the serving process.
//
//   pjrt_serve --plugin libfoo_pjrt.so --bundle DIR --fn decode \
//              --input z.npy --output y.npy [--platform tpu] \
//              [--bench N] [--warmup K] [--create key=value ...]
//
// What it does:
//   1. parses manifest.json (minimal JSON parser below) — the "native"
//      section records the flat calling convention: the module's
//      operands are the KEPT inputs (param leaves by npz key, then the
//      logical array arguments; XLA drops unused leaves at lowering);
//   2. reads params.npz (ZIP stored/deflate + npy headers, zlib only)
//      and dequantizes ::bf16 / ::int8+::scale storage to float32;
//   3. dlopens the plugin, GetPjrtApi, creates a client with the
//      --create named options (int64 if the value parses as an
//      integer, else string — e.g. topology=v5e:1x1x1);
//   4. compiles the StableHLO with the bundle's compile_options.pb
//      (serialized xla.CompileOptionsProto, written at export time);
//   5. uploads the param buffers ONCE, then executes: single request or
//      a --bench N latency loop reusing the device-resident inputs.
//
// Prints exactly one JSON line on stdout (latency stats or the output
// metadata); all diagnostics go to stderr.  Single-device by design —
// data-parallel bundles are served by the jax loader (serving.py).

#include <dlfcn.h>
#include <zlib.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void die(const std::string& msg) {
  fprintf(stderr, "pjrt_serve: %s\n", msg.c_str());
  exit(1);
}

// ---------------------------------------------------------------------------
// Minimal JSON (objects/arrays/strings/numbers/bools/null; UTF-8 passthrough)
// ---------------------------------------------------------------------------

struct Json {
  enum Kind { kNull, kBool, kNum, kStr, kArr, kObj } kind = kNull;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<Json> arr;
  std::map<std::string, Json> obj;

  const Json& at(const std::string& k) const {
    auto it = obj.find(k);
    if (it == obj.end()) die("manifest: missing key '" + k + "'");
    return it->second;
  }
  bool has(const std::string& k) const { return obj.count(k) > 0; }
  int64_t as_int() const {
    if (kind == kNum) return static_cast<int64_t>(num);
    if (kind == kStr) return strtoll(str.c_str(), nullptr, 10);
    die("manifest: expected integer");
  }
};

struct JsonParser {
  const char* p;
  const char* end;
  explicit JsonParser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}
  void ws() { while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p; }
  char peek() { ws(); if (p >= end) die("json: unexpected end"); return *p; }
  void expect(char c) { if (peek() != c) die(std::string("json: expected '") + c + "'"); ++p; }
  Json parse() {
    char c = peek();
    if (c == '{') return obj();
    if (c == '[') return arr();
    if (c == '"') { Json j; j.kind = Json::kStr; j.str = str(); return j; }
    if (c == 't') { lit("true"); Json j; j.kind = Json::kBool; j.b = true; return j; }
    if (c == 'f') { lit("false"); Json j; j.kind = Json::kBool; j.b = false; return j; }
    if (c == 'n') { lit("null"); return Json{}; }
    return num();
  }
  void lit(const char* s) { ws(); size_t n = strlen(s);
    if (p + n > end || strncmp(p, s, n) != 0) die("json: bad literal"); p += n; }
  std::string str() {
    expect('"');
    std::string out;
    while (p < end && *p != '"') {
      if (*p == '\\') {
        ++p; if (p >= end) die("json: bad escape");
        switch (*p) {
          case 'n': out += '\n'; break; case 't': out += '\t'; break;
          case 'r': out += '\r'; break; case 'b': out += '\b'; break;
          case 'f': out += '\f'; break; case 'u': {
            if (p + 4 >= end) die("json: bad \\u");
            unsigned v = strtoul(std::string(p + 1, p + 5).c_str(), nullptr, 16);
            p += 4;
            if (v < 0x80) out += static_cast<char>(v);
            else if (v < 0x800) { out += static_cast<char>(0xC0 | (v >> 6));
                                  out += static_cast<char>(0x80 | (v & 0x3F)); }
            else { out += static_cast<char>(0xE0 | (v >> 12));
                   out += static_cast<char>(0x80 | ((v >> 6) & 0x3F));
                   out += static_cast<char>(0x80 | (v & 0x3F)); }
            break; }
          default: out += *p;
        }
        ++p;
      } else out += *p++;
    }
    if (p >= end) die("json: unterminated string");
    ++p;
    return out;
  }
  Json num() {
    ws();
    char* e = nullptr;
    Json j; j.kind = Json::kNum; j.num = strtod(p, &e);
    if (e == p) die("json: bad number");
    p = e;
    return j;
  }
  Json arr() {
    expect('[');
    Json j; j.kind = Json::kArr;
    if (peek() == ']') { ++p; return j; }
    while (true) {
      j.arr.push_back(parse());
      char c = peek();
      if (c == ']') { ++p; break; }
      expect(',');
    }
    return j;
  }
  Json obj() {
    expect('{');
    Json j; j.kind = Json::kObj;
    if (peek() == '}') { ++p; return j; }
    while (true) {
      std::string k = str();
      expect(':');
      j.obj[k] = parse();
      char c = peek();
      if (c == '}') { ++p; break; }
      expect(',');
    }
    return j;
  }
};

// ---------------------------------------------------------------------------
// npy / npz (ZIP) reading — np.savez layout: stored or deflated .npy members
// ---------------------------------------------------------------------------

struct HostArray {
  std::string dtype;          // numpy descr without byte order, e.g. "f4"
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;  // C-contiguous
  int64_t nelem() const {
    int64_t n = 1;
    for (auto d : dims) n *= d;
    return n;
  }
};

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (uint32_t(p[2]) << 16) | (uint32_t(p[3]) << 24);
}

HostArray parse_npy(const uint8_t* p, size_t n) {
  if (n < 10 || memcmp(p, "\x93NUMPY", 6) != 0) die("npz: bad npy magic");
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) { hlen = rd16(p + 8); hoff = 10; }
  else { hlen = rd32(p + 8); hoff = 12; }
  if (hoff + hlen > n) die("npz: truncated npy header");
  std::string hdr(reinterpret_cast<const char*>(p + hoff), hlen);
  HostArray out;
  // descr
  auto dp = hdr.find("'descr'");
  if (dp == std::string::npos) die("npz: no descr");
  auto q1 = hdr.find('\'', dp + 7);
  auto q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (!descr.empty() && (descr[0] == '<' || descr[0] == '|' || descr[0] == '='))
    descr = descr.substr(1);
  else if (!descr.empty() && descr[0] == '>')
    die("npz: big-endian arrays unsupported");
  out.dtype = descr;
  if (hdr.find("'fortran_order': True") != std::string::npos)
    die("npz: fortran-order arrays unsupported");
  // shape
  auto sp = hdr.find("'shape'");
  auto b1 = hdr.find('(', sp);
  auto b2 = hdr.find(')', b1);
  std::string shp = hdr.substr(b1 + 1, b2 - b1 - 1);
  std::stringstream ss(shp);
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    // strip spaces
    tok.erase(std::remove_if(tok.begin(), tok.end(),
                             [](char c) { return c == ' '; }), tok.end());
    if (!tok.empty()) out.dims.push_back(strtoll(tok.c_str(), nullptr, 10));
  }
  size_t itemsize = strtoul(descr.c_str() + 1, nullptr, 10);
  if (itemsize == 0) die("npz: bad descr '" + descr + "'");
  size_t want = itemsize;
  for (auto d : out.dims) want *= static_cast<size_t>(d);
  if (hoff + hlen + want > n) die("npz: truncated npy payload");
  out.data.assign(p + hoff + hlen, p + hoff + hlen + want);
  return out;
}

HostArray read_npy_file(const std::string& path) {
  std::string blob = read_file(path);
  return parse_npy(reinterpret_cast<const uint8_t*>(blob.data()), blob.size());
}

void write_npy_file(const std::string& path, const HostArray& a) {
  std::string descr = "<" + a.dtype;
  // numpy tuple spelling: "(4, 10)", "(4,)", "()"
  std::string shp = "(";
  for (size_t i = 0; i < a.dims.size(); ++i) {
    shp += std::to_string(a.dims[i]);
    if (i + 1 < a.dims.size()) shp += ", ";
  }
  if (a.dims.size() == 1) shp += ",";
  shp += ")";
  std::string hdr = "{'descr': '" + descr +
                    "', 'fortran_order': False, 'shape': " + shp + ", }";
  size_t total = 10 + hdr.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  hdr += std::string(pad, ' ');
  hdr += '\n';
  std::ofstream f(path, std::ios::binary);
  if (!f) die("cannot write " + path);
  f.write("\x93NUMPY\x01\x00", 8);
  uint16_t hl = static_cast<uint16_t>(hdr.size());
  f.put(static_cast<char>(hl & 0xFF));
  f.put(static_cast<char>(hl >> 8));
  f.write(hdr.data(), hdr.size());
  f.write(reinterpret_cast<const char*>(a.data.data()), a.data.size());
}

// ZIP central-directory walk; supports method 0 (stored) and 8 (deflate).
std::map<std::string, HostArray> read_npz(const std::string& path) {
  std::string blob = read_file(path);
  const uint8_t* base = reinterpret_cast<const uint8_t*>(blob.data());
  size_t n = blob.size();
  if (n < 22) die("npz: file too small for a ZIP archive");
  // find EOCD (scan back over optional comment)
  size_t eocd = std::string::npos;
  for (size_t i = n >= 22 ? n - 22 : 0;; --i) {
    if (rd32(base + i) == 0x06054b50) { eocd = i; break; }
    if (i == 0) break;
  }
  if (eocd == std::string::npos) die("npz: no ZIP end-of-central-directory");
  uint16_t nent = rd16(base + eocd + 10);
  uint32_t cdoff = rd32(base + eocd + 16);
  std::map<std::string, HostArray> out;
  size_t p = cdoff;
  for (int e = 0; e < nent; ++e) {
    if (rd32(base + p) != 0x02014b50) die("npz: bad central-directory entry");
    uint16_t method = rd16(base + p + 10);
    uint32_t csize = rd32(base + p + 20);
    uint32_t usize = rd32(base + p + 24);
    uint16_t nlen = rd16(base + p + 28);
    uint16_t xlen = rd16(base + p + 30);
    uint16_t clen = rd16(base + p + 32);
    uint32_t lho = rd32(base + p + 42);
    std::string name(reinterpret_cast<const char*>(base + p + 46), nlen);
    p += 46 + nlen + xlen + clen;
    // local header: recompute payload offset (its name/extra may differ)
    if (rd32(base + lho) != 0x04034b50) die("npz: bad local header");
    uint16_t lnlen = rd16(base + lho + 26);
    uint16_t lxlen = rd16(base + lho + 28);
    const uint8_t* payload = base + lho + 30 + lnlen + lxlen;
    std::vector<uint8_t> raw;
    if (method == 0) {
      raw.assign(payload, payload + csize);
    } else if (method == 8) {
      raw.resize(usize);
      z_stream zs{};
      if (inflateInit2(&zs, -15) != Z_OK) die("npz: inflateInit2 failed");
      zs.next_in = const_cast<uint8_t*>(payload);
      zs.avail_in = csize;
      zs.next_out = raw.data();
      zs.avail_out = usize;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) die("npz: inflate failed on " + name);
    } else {
      die("npz: unsupported compression method");
    }
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      name = name.substr(0, name.size() - 4);
    out[name] = parse_npy(raw.data(), raw.size());
  }
  return out;
}

// ---------------------------------------------------------------------------
// storage dequantization (mirrors serving.py::_dequantize_flat)
// ---------------------------------------------------------------------------

std::map<std::string, HostArray> dequantize(std::map<std::string, HostArray> flat) {
  std::map<std::string, HostArray> out;
  for (auto& [k, v] : flat) {
    auto ends = [&](const char* s) {
      size_t sl = strlen(s);
      return k.size() > sl && k.compare(k.size() - sl, sl, s) == 0;
    };
    if (ends("::scale")) continue;
    if (ends("::bf16")) {
      HostArray a;
      a.dims = v.dims;
      a.dtype = "f4";
      a.data.resize(v.nelem() * 4);
      const uint16_t* src = reinterpret_cast<const uint16_t*>(v.data.data());
      uint32_t* dst = reinterpret_cast<uint32_t*>(a.data.data());
      for (int64_t i = 0; i < v.nelem(); ++i)
        dst[i] = static_cast<uint32_t>(src[i]) << 16;
      out[k.substr(0, k.size() - 6)] = std::move(a);
    } else if (ends("::int8")) {
      auto it = flat.find(k.substr(0, k.size() - 6) + "::scale");
      if (it == flat.end()) die("params: missing ::scale for " + k);
      const HostArray& s = it->second;
      HostArray a;
      a.dims = v.dims;
      a.dtype = "f4";
      a.data.resize(v.nelem() * 4);
      // scale shape: all-but-last dims are 1 -> one scale per last-axis col
      int64_t cols = v.dims.empty() ? 1 : v.dims.back();
      if (s.dtype != "f4")
        die("params: ::scale for " + k + " has dtype " + s.dtype +
            " (want f4)");
      if (s.nelem() != cols)
        die("params: ::scale for " + k + " has " +
            std::to_string(s.nelem()) + " elements (want " +
            std::to_string(cols) + ")");
      const int8_t* q = reinterpret_cast<const int8_t*>(v.data.data());
      const float* sc = reinterpret_cast<const float*>(s.data.data());
      float* dst = reinterpret_cast<float*>(a.data.data());
      for (int64_t i = 0; i < v.nelem(); ++i)
        dst[i] = static_cast<float>(q[i]) * sc[i % cols];
      out[k.substr(0, k.size() - 6)] = std::move(a);
    } else {
      out[k] = std::move(v);
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// PJRT driving
// ---------------------------------------------------------------------------

struct Pjrt {
  const PJRT_Api* api = nullptr;

  void check(PJRT_Error* err, const char* what) {
    if (!err) return;
    PJRT_Error_Message_Args m{PJRT_Error_Message_Args_STRUCT_SIZE, nullptr,
                              err, nullptr, 0};
    api->PJRT_Error_Message(&m);
    std::string msg(m.message, m.message_size);
    PJRT_Error_Destroy_Args d{PJRT_Error_Destroy_Args_STRUCT_SIZE, nullptr, err};
    api->PJRT_Error_Destroy(&d);
    die(std::string(what) + ": " + msg);
  }

  void await_and_destroy(PJRT_Event* ev, const char* what) {
    PJRT_Event_Await_Args a{PJRT_Event_Await_Args_STRUCT_SIZE, nullptr, ev};
    PJRT_Error* err = api->PJRT_Event_Await(&a);
    PJRT_Event_Destroy_Args d{PJRT_Event_Destroy_Args_STRUCT_SIZE, nullptr, ev};
    // destroy even on error; check() exits afterwards
    if (err) {
      PJRT_Error_Message_Args m{PJRT_Error_Message_Args_STRUCT_SIZE, nullptr,
                                err, nullptr, 0};
      api->PJRT_Error_Message(&m);
      std::string msg(m.message, m.message_size);
      PJRT_Error_Destroy_Args ed{PJRT_Error_Destroy_Args_STRUCT_SIZE, nullptr, err};
      api->PJRT_Error_Destroy(&ed);
      api->PJRT_Event_Destroy(&d);
      die(std::string(what) + ": " + msg);
    }
    api->PJRT_Event_Destroy(&d);
  }
};

PJRT_Buffer_Type dtype_to_pjrt(const std::string& dt) {
  if (dt == "float32" || dt == "f4") return PJRT_Buffer_Type_F32;
  if (dt == "float64" || dt == "f8") return PJRT_Buffer_Type_F64;
  if (dt == "uint32" || dt == "u4") return PJRT_Buffer_Type_U32;
  if (dt == "int32" || dt == "i4") return PJRT_Buffer_Type_S32;
  if (dt == "int64" || dt == "i8") return PJRT_Buffer_Type_S64;
  if (dt == "uint8" || dt == "u1") return PJRT_Buffer_Type_U8;
  if (dt == "int8" || dt == "i1") return PJRT_Buffer_Type_S8;
  if (dt == "bool" || dt == "b1") return PJRT_Buffer_Type_PRED;
  die("unsupported dtype '" + dt + "'");
}

std::string pjrt_to_npy(PJRT_Buffer_Type t, size_t* itemsize) {
  switch (t) {
    case PJRT_Buffer_Type_F32: *itemsize = 4; return "f4";
    case PJRT_Buffer_Type_F64: *itemsize = 8; return "f8";
    case PJRT_Buffer_Type_U32: *itemsize = 4; return "u4";
    case PJRT_Buffer_Type_S32: *itemsize = 4; return "i4";
    case PJRT_Buffer_Type_S64: *itemsize = 8; return "i8";
    case PJRT_Buffer_Type_U8:  *itemsize = 1; return "u1";
    case PJRT_Buffer_Type_S8:  *itemsize = 1; return "i1";
    case PJRT_Buffer_Type_PRED: *itemsize = 1; return "b1";
    default: die("unsupported output buffer type");
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin, bundle, fn = "decode", platform, output;
  std::vector<std::string> inputs;
  std::vector<std::pair<std::string, std::string>> creates;
  long bench = 0, warmup = 2;
  bool verbose = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) die("missing value for " + a);
      return argv[++i];
    };
    if (a == "--plugin") plugin = next();
    else if (a == "--bundle") bundle = next();
    else if (a == "--fn") fn = next();
    else if (a == "--platform") platform = next();
    else if (a == "--input") inputs.push_back(next());
    else if (a == "--output") output = next();
    else if (a == "--bench") bench = strtol(next().c_str(), nullptr, 10);
    else if (a == "--warmup") warmup = strtol(next().c_str(), nullptr, 10);
    else if (a == "--verbose") verbose = true;
    else if (a == "--create") {
      std::string kv = next();
      auto eq = kv.find('=');
      if (eq == std::string::npos) die("--create expects key=value");
      creates.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else die("unknown flag " + a);
  }
  if (plugin.empty() || bundle.empty()) die("--plugin and --bundle are required");

  // ---- bundle ----
  Json manifest = JsonParser(read_file(bundle + "/manifest.json")).parse();
  if (!manifest.has("native"))
    die("bundle has no 'native' section — re-export with native=True "
        "(serving.export_serving) for the C++ host");
  const Json& nat = manifest.at("native");
  if (manifest.has("data_parallel") && manifest.at("data_parallel").as_int() > 1)
    die("data-parallel bundles are served by the jax loader, not this host");
  const Json& nfn = nat.at("functions").at(fn);
  if (platform.empty())
    platform = nat.at("platforms").arr.front().str;
  if (!nfn.at("modules").has(platform))
    die("bundle has no native module for platform '" + platform + "'");
  std::string module_text =
      read_file(bundle + "/" + nfn.at("modules").at(platform).str);
  std::string compile_opts =
      read_file(bundle + "/" + nat.at("compile_options").str);
  auto params = dequantize(read_npz(bundle + "/params.npz"));

  // logical array arguments from --input files (in manifest "args" order)
  const auto& args_spec = nfn.at("args").arr;
  if (inputs.size() != args_spec.size())
    die("function '" + fn + "' takes " + std::to_string(args_spec.size()) +
        " array input(s) (see manifest), got " + std::to_string(inputs.size()));
  std::vector<HostArray> logical;
  for (size_t i = 0; i < inputs.size(); ++i) {
    HostArray a = read_npy_file(inputs[i]);
    const auto& spec = args_spec[i];
    const auto& want_dims = spec.at("shape").arr;
    if (a.dims.size() != want_dims.size())
      die("input " + inputs[i] + ": rank mismatch vs manifest");
    for (size_t d = 0; d < want_dims.size(); ++d)
      if (a.dims[d] != want_dims[d].as_int())
        die("input " + inputs[i] + ": shape mismatch at dim " +
            std::to_string(d) + " (bundle batch is fixed at export time)");
    if (dtype_to_pjrt(a.dtype) != dtype_to_pjrt(spec.at("dtype").str))
      die("input " + inputs[i] + ": dtype mismatch vs manifest");
    logical.push_back(std::move(a));
  }

  // the module's operands: kept inputs in order
  struct Operand { const HostArray* host; std::string dtype; };
  std::vector<Operand> operands;
  for (const auto& inp : nfn.at("inputs").arr) {
    if (inp.at("kind").str == "param") {
      auto it = params.find(inp.at("name").str);
      if (it == params.end())
        die("params.npz missing leaf '" + inp.at("name").str + "'");
      operands.push_back({&it->second, it->second.dtype});
    } else {
      size_t idx = static_cast<size_t>(inp.at("index").as_int());
      operands.push_back({&logical[idx], logical[idx].dtype});
    }
  }

  // ---- plugin ----
  void* dl = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!dl) die(std::string("dlopen: ") + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(dl, "GetPjrtApi"));
  if (!get_api) die("plugin exports no GetPjrtApi");
  Pjrt pj;
  pj.api = get_api();
  if (!pj.api) die("GetPjrtApi returned null");
  if (pj.api->pjrt_api_version.major_version != PJRT_API_MAJOR)
    die("PJRT API major version mismatch: plugin " +
        std::to_string(pj.api->pjrt_api_version.major_version) +
        " vs host " + std::to_string(PJRT_API_MAJOR));
  {
    PJRT_Plugin_Initialize_Args a{PJRT_Plugin_Initialize_Args_STRUCT_SIZE,
                                  nullptr};
    pj.check(pj.api->PJRT_Plugin_Initialize(&a), "Plugin_Initialize");
  }

  // client create options (typed: int64 when the value parses fully)
  std::vector<PJRT_NamedValue> opts;
  std::vector<int64_t> opt_ints(creates.size());
  for (size_t i = 0; i < creates.size(); ++i) {
    PJRT_NamedValue v{};
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = creates[i].first.c_str();
    v.name_size = creates[i].first.size();
    char* endp = nullptr;
    long long iv = strtoll(creates[i].second.c_str(), &endp, 10);
    if (endp && *endp == '\0' && !creates[i].second.empty()) {
      v.type = PJRT_NamedValue_kInt64;
      opt_ints[i] = iv;
      v.int64_value = opt_ints[i];
      v.value_size = 1;
    } else {
      v.type = PJRT_NamedValue_kString;
      v.string_value = creates[i].second.c_str();
      v.value_size = creates[i].second.size();
    }
    opts.push_back(v);
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args a{};
    a.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    a.create_options = opts.empty() ? nullptr : opts.data();
    a.num_options = opts.size();
    pj.check(pj.api->PJRT_Client_Create(&a), "Client_Create");
    client = a.client;
  }
  {
    PJRT_Client_PlatformName_Args a{PJRT_Client_PlatformName_Args_STRUCT_SIZE,
                                    nullptr, client, nullptr, 0};
    pj.check(pj.api->PJRT_Client_PlatformName(&a), "PlatformName");
    if (verbose)
      fprintf(stderr, "pjrt_serve: platform %.*s\n",
              static_cast<int>(a.platform_name_size), a.platform_name);
  }
  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args a{
        PJRT_Client_AddressableDevices_Args_STRUCT_SIZE, nullptr, client,
        nullptr, 0};
    pj.check(pj.api->PJRT_Client_AddressableDevices(&a), "AddressableDevices");
    if (a.num_addressable_devices == 0) die("no addressable devices");
    device = a.addressable_devices[0];
  }

  // ---- compile ----
  auto t_c0 = std::chrono::steady_clock::now();
  PJRT_LoadedExecutable* exec = nullptr;
  {
    PJRT_Program prog{};
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = module_text.data();
    prog.code_size = module_text.size();
    static const char kFormat[] = "mlir";
    prog.format = kFormat;
    prog.format_size = sizeof(kFormat) - 1;
    PJRT_Client_Compile_Args a{};
    a.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    a.client = client;
    a.program = &prog;
    a.compile_options = compile_opts.data();
    a.compile_options_size = compile_opts.size();
    pj.check(pj.api->PJRT_Client_Compile(&a), "Compile");
    exec = a.executable;
  }
  double compile_ms = std::chrono::duration<double, std::milli>(
      std::chrono::steady_clock::now() - t_c0).count();
  if (verbose) fprintf(stderr, "pjrt_serve: compile %.0f ms\n", compile_ms);

  size_t num_outputs = 1;
  {
    PJRT_LoadedExecutable_GetExecutable_Args g{
        PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE, nullptr, exec,
        nullptr};
    pj.check(pj.api->PJRT_LoadedExecutable_GetExecutable(&g), "GetExecutable");
    PJRT_Executable_NumOutputs_Args n{
        PJRT_Executable_NumOutputs_Args_STRUCT_SIZE, nullptr, g.executable, 0};
    pj.check(pj.api->PJRT_Executable_NumOutputs(&n), "NumOutputs");
    num_outputs = n.num_outputs;
    PJRT_Executable_Destroy_Args d{PJRT_Executable_Destroy_Args_STRUCT_SIZE,
                                   nullptr, g.executable};
    pj.check(pj.api->PJRT_Executable_Destroy(&d), "Executable_Destroy");
  }

  // ---- upload operands (params once; inputs once — reused in bench) ----
  std::vector<PJRT_Buffer*> arg_bufs;
  for (const auto& op : operands) {
    PJRT_Client_BufferFromHostBuffer_Args a{};
    a.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    a.client = client;
    a.data = op.host->data.data();
    a.type = dtype_to_pjrt(op.dtype);
    a.dims = op.host->dims.data();
    a.num_dims = op.host->dims.size();
    a.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    a.device = device;
    pj.check(pj.api->PJRT_Client_BufferFromHostBuffer(&a), "BufferFromHost");
    pj.await_and_destroy(a.done_with_host_buffer, "H2D transfer");
    arg_bufs.push_back(a.buffer);
  }

  auto run_once = [&](bool fetch, HostArray* out0) -> double {
    PJRT_ExecuteOptions eopts{};
    eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    // serving never donates inputs: params and inputs are reused
    std::vector<int64_t> nondonate(arg_bufs.size());
    for (size_t i = 0; i < nondonate.size(); ++i) nondonate[i] = i;
    eopts.non_donatable_input_indices = nondonate.data();
    eopts.num_non_donatable_input_indices = nondonate.size();
    PJRT_Buffer* const* arg_list = arg_bufs.data();
    std::vector<PJRT_Buffer*> outs(num_outputs, nullptr);
    PJRT_Buffer** out_list = outs.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args a{};
    a.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    a.executable = exec;
    a.options = &eopts;
    a.argument_lists = &arg_list;
    a.num_devices = 1;
    a.num_args = arg_bufs.size();
    a.output_lists = &out_list;
    a.device_complete_events = &done;
    auto t0 = std::chrono::steady_clock::now();
    pj.check(pj.api->PJRT_LoadedExecutable_Execute(&a), "Execute");
    pj.await_and_destroy(done, "device completion");
    double ms = std::chrono::duration<double, std::milli>(
        std::chrono::steady_clock::now() - t0).count();
    if (fetch && out0) {
      PJRT_Buffer* b = outs[0];
      PJRT_Buffer_ElementType_Args te{PJRT_Buffer_ElementType_Args_STRUCT_SIZE,
                                      nullptr, b, PJRT_Buffer_Type_INVALID};
      pj.check(pj.api->PJRT_Buffer_ElementType(&te), "ElementType");
      PJRT_Buffer_Dimensions_Args td{PJRT_Buffer_Dimensions_Args_STRUCT_SIZE,
                                     nullptr, b, nullptr, 0};
      pj.check(pj.api->PJRT_Buffer_Dimensions(&td), "Dimensions");
      size_t itemsize = 0;
      out0->dtype = pjrt_to_npy(te.type, &itemsize);
      out0->dims.assign(td.dims, td.dims + td.num_dims);
      size_t bytes = itemsize;
      for (size_t d = 0; d < td.num_dims; ++d) bytes *= td.dims[d];
      out0->data.resize(bytes);
      PJRT_Buffer_ToHostBuffer_Args th{};
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = b;
      th.dst = out0->data.data();
      th.dst_size = bytes;
      pj.check(pj.api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
      pj.await_and_destroy(th.event, "D2H transfer");
    }
    for (PJRT_Buffer* b : outs) {
      PJRT_Buffer_Destroy_Args d{PJRT_Buffer_Destroy_Args_STRUCT_SIZE, nullptr,
                                 b};
      pj.check(pj.api->PJRT_Buffer_Destroy(&d), "Buffer_Destroy");
    }
    return ms;
  };

  HostArray result;
  if (bench > 0) {
    for (long i = 0; i < warmup; ++i) run_once(false, nullptr);
    std::vector<double> lat;
    lat.reserve(bench);
    for (long i = 0; i < bench; ++i) lat.push_back(run_once(false, nullptr));
    run_once(true, &result);
    std::sort(lat.begin(), lat.end());
    double mean = 0;
    for (double v : lat) mean += v;
    mean /= lat.size();
    double p50 = lat[lat.size() / 2];
    double p90 = lat[static_cast<size_t>(lat.size() * 0.9)];
    int64_t batch = result.dims.empty() ? 1 : result.dims[0];
    printf("{\"fn\": \"%s\", \"platform\": \"%s\", \"batch\": %lld, "
           "\"compile_ms\": %.1f, \"mean_ms\": %.3f, \"p50_ms\": %.3f, "
           "\"p90_ms\": %.3f, \"requests_per_s\": %.1f, "
           "\"samples_per_s\": %.1f}\n",
           fn.c_str(), platform.c_str(), static_cast<long long>(batch),
           compile_ms, mean, p50, p90, 1000.0 / mean,
           1000.0 / mean * batch);
  } else {
    double ms = run_once(true, &result);
    std::string dims = "[";
    for (size_t i = 0; i < result.dims.size(); ++i)
      dims += (i ? ", " : "") + std::to_string(result.dims[i]);
    dims += "]";
    printf("{\"fn\": \"%s\", \"platform\": \"%s\", \"out_shape\": %s, "
           "\"out_dtype\": \"%s\", \"compile_ms\": %.1f, \"ms\": %.3f}\n",
           fn.c_str(), platform.c_str(), dims.c_str(), result.dtype.c_str(),
           compile_ms, ms);
  }
  if (!output.empty()) write_npy_file(output, result);

  // ---- teardown ----
  for (PJRT_Buffer* b : arg_bufs) {
    PJRT_Buffer_Destroy_Args d{PJRT_Buffer_Destroy_Args_STRUCT_SIZE, nullptr, b};
    pj.check(pj.api->PJRT_Buffer_Destroy(&d), "Buffer_Destroy");
  }
  {
    PJRT_LoadedExecutable_Destroy_Args d{
        PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE, nullptr, exec};
    pj.check(pj.api->PJRT_LoadedExecutable_Destroy(&d), "Executable_Destroy");
  }
  {
    PJRT_Client_Destroy_Args d{PJRT_Client_Destroy_Args_STRUCT_SIZE, nullptr,
                               client};
    pj.check(pj.api->PJRT_Client_Destroy(&d), "Client_Destroy");
  }
  return 0;
}
