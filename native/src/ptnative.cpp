// ptnative — native runtime companion for pathtracer_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the parts
// the reference implements in host C++: the scene-DSL loader
// (reference: src/scene.cpp) and image encoding (reference: src/image.cpp
// + vendored stb_image_write).  Exposed through a small C ABI consumed by
// ctypes (pathtracer_tpu/utils/native.py); a pure-Python fallback exists
// for both, so this is an optional fast path, not a hard dependency.
//
// Build: `make -C native` -> native/libptnative.so

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// Scene DSL parsing
// ---------------------------------------------------------------------------

struct Material {
  float rgb[3] = {0, 0, 0};
  float specex = 0;
  float specrgb[3] = {0, 0, 0};
  float refl = 0, refr = 0, refrior = 0, scatter = 0;
  float abscoeff[3] = {0, 0, 0};
  float rsctcoeff = 0, emittance = 0;
};

struct FrameVec {
  float v[3];
};

struct Object {
  int type = 0;  // 0 sphere, 1 cube, 2 mesh
  int material = 0;
  std::vector<FrameVec> trans, rotat, scale;
};

struct CameraBlock {
  int res[2] = {0, 0};
  float fovy = 0;
  int iterations = 0;
  std::string file;
  float aperture = 0, focal = 0;
  std::vector<FrameVec> eye, view, up;
};

struct ParsedScene {
  std::vector<Material> materials;
  CameraBlock camera;
  std::vector<Object> objects;
  std::string error;
};

std::vector<std::string> tokenize(const std::string& line) {
  // strip // comments then whitespace-split (utilities.cpp:97-103 analog)
  std::string s = line;
  size_t c = s.find("//");
  if (c != std::string::npos) s.resize(c);
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && std::isspace((unsigned char)s[i])) i++;
    size_t j = i;
    while (j < s.size() && !std::isspace((unsigned char)s[j])) j++;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

std::string upper(std::string s) {
  for (auto& ch : s) ch = std::toupper((unsigned char)ch);
  return s;
}

std::string lower(std::string s) {
  for (auto& ch : s) ch = std::tolower((unsigned char)ch);
  return s;
}

struct LineReader {
  std::vector<std::vector<std::string>> lines;
  size_t pos = 0;
  explicit LineReader(const char* text) {
    std::string cur;
    for (const char* p = text;; p++) {
      if (*p == '\n' || *p == '\0') {
        auto toks = tokenize(cur);
        if (!toks.empty()) lines.push_back(std::move(toks));
        cur.clear();
        if (*p == '\0') break;
      } else {
        cur.push_back(*p);
      }
    }
  }
  const std::vector<std::string>* peek() const {
    return pos < lines.size() ? &lines[pos] : nullptr;
  }
  const std::vector<std::string>* next() {
    return pos < lines.size() ? &lines[pos++] : nullptr;
  }
};

bool read3(const std::vector<std::string>& t, float* out) {
  if (t.size() < 4) return false;
  for (int i = 0; i < 3; i++) out[i] = std::strtof(t[i + 1].c_str(), nullptr);
  return true;
}

bool parse_material(LineReader& r, ParsedScene& sc, int id) {
  if (id != (int)sc.materials.size()) {
    sc.error = "MATERIAL ids must be sequential";
    return false;
  }
  Material m;
  for (int k = 0; k < 10; k++) {
    const auto* t = r.next();
    if (!t || t->empty()) {
      sc.error = "unexpected EOF in MATERIAL";
      return false;
    }
    std::string key = upper((*t)[0]);
    if (key == "RGB") read3(*t, m.rgb);
    else if (key == "SPECEX") m.specex = std::strtof((*t)[1].c_str(), nullptr);
    else if (key == "SPECRGB") read3(*t, m.specrgb);
    else if (key == "REFL") m.refl = std::strtof((*t)[1].c_str(), nullptr);
    else if (key == "REFR") m.refr = std::strtof((*t)[1].c_str(), nullptr);
    else if (key == "REFRIOR") m.refrior = std::strtof((*t)[1].c_str(), nullptr);
    else if (key == "SCATTER") m.scatter = std::strtof((*t)[1].c_str(), nullptr);
    else if (key == "ABSCOEFF") read3(*t, m.abscoeff);
    else if (key == "RSCTCOEFF") m.rsctcoeff = std::strtof((*t)[1].c_str(), nullptr);
    else if (key == "EMITTANCE") m.emittance = std::strtof((*t)[1].c_str(), nullptr);
    else {
      sc.error = "unknown material key " + key;
      return false;
    }
  }
  sc.materials.push_back(m);
  return true;
}

bool parse_camera(LineReader& r, ParsedScene& sc) {
  CameraBlock& c = sc.camera;
  while (const auto* t = r.peek()) {
    std::string key = upper((*t)[0]);
    if (key == "RES" && t->size() >= 3) {
      c.res[0] = (int)std::strtof((*t)[1].c_str(), nullptr);
      c.res[1] = (int)std::strtof((*t)[2].c_str(), nullptr);
      r.next();
    } else if (key == "FOVY") {
      c.fovy = std::strtof((*t)[1].c_str(), nullptr);
      r.next();
    } else if (key == "ITERATIONS") {
      c.iterations = (int)std::strtof((*t)[1].c_str(), nullptr);
      r.next();
    } else if (key == "FILE") {
      c.file = (*t)[1];
      r.next();
    } else if (key == "APERTURE") {
      c.aperture = std::strtof((*t)[1].c_str(), nullptr);
      r.next();
    } else if (key == "FOCAL") {
      c.focal = std::strtof((*t)[1].c_str(), nullptr);
      r.next();
    } else if (key == "FRAME") {
      if ((int)std::strtof((*t)[1].c_str(), nullptr) != (int)c.eye.size()) {
        sc.error = "camera frames must be sequential";
        return false;
      }
      r.next();
      FrameVec eye{}, view{}, up{};
      for (int k = 0; k < 3; k++) {
        const auto* p = r.next();
        if (!p) { sc.error = "unexpected EOF in camera frame"; return false; }
        std::string pk = upper((*p)[0]);
        float v[3];
        if (!read3(*p, v)) { sc.error = "bad camera frame line"; return false; }
        if (pk == "EYE") std::memcpy(eye.v, v, sizeof v);
        else if (pk == "VIEW") std::memcpy(view.v, v, sizeof v);
        else if (pk == "UP") std::memcpy(up.v, v, sizeof v);
        else { sc.error = "unknown camera frame key " + pk; return false; }
      }
      c.eye.push_back(eye);
      c.view.push_back(view);
      c.up.push_back(up);
    } else {
      break;  // next top-level block
    }
  }
  if (c.res[0] == 0 || c.fovy == 0 || c.file.empty()) {
    sc.error = "CAMERA missing RES/FOVY/FILE";
    return false;
  }
  if (c.eye.empty()) {
    sc.error = "CAMERA has no frames";
    return false;
  }
  return true;
}

bool parse_object(LineReader& r, ParsedScene& sc, int id) {
  if (id != (int)sc.objects.size()) {
    sc.error = "OBJECT ids must be sequential";
    return false;
  }
  Object o;
  const auto* t = r.next();
  if (!t) { sc.error = "unexpected EOF in OBJECT"; return false; }
  std::string ty = lower((*t)[0]);
  if (ty == "sphere") o.type = 0;
  else if (ty == "cube") o.type = 1;
  else if (ty.size() > 4 && ty.substr(ty.size() - 4) == ".obj") o.type = 2;
  else { sc.error = "unknown object type " + ty; return false; }

  t = r.next();
  if (!t || lower((*t)[0]) != "material") {
    sc.error = "expected 'material'";
    return false;
  }
  o.material = (int)std::strtof((*t)[1].c_str(), nullptr);

  while (const auto* p = r.peek()) {
    if (upper((*p)[0]) != "FRAME") break;
    if ((int)std::strtof((*p)[1].c_str(), nullptr) != (int)o.trans.size()) {
      sc.error = "object frames must be sequential";
      return false;
    }
    r.next();
    FrameVec tr{}, ro{}, scl{};
    for (int k = 0; k < 3; k++) {
      const auto* q = r.next();
      if (!q) { sc.error = "unexpected EOF in object frame"; return false; }
      std::string qk = upper((*q)[0]);
      float v[3];
      if (!read3(*q, v)) { sc.error = "bad object frame line"; return false; }
      if (qk == "TRANS") std::memcpy(tr.v, v, sizeof v);
      else if (qk == "ROTAT") std::memcpy(ro.v, v, sizeof v);
      else if (qk == "SCALE") std::memcpy(scl.v, v, sizeof v);
      else { sc.error = "unknown object frame key " + qk; return false; }
    }
    o.trans.push_back(tr);
    o.rotat.push_back(ro);
    o.scale.push_back(scl);
  }
  if (o.trans.empty()) {
    sc.error = "object has no frames";
    return false;
  }
  sc.objects.push_back(o);
  return true;
}

ParsedScene* parse(const char* text) {
  auto* sc = new ParsedScene();
  LineReader r(text);
  while (const auto* t = r.next()) {
    std::string head = upper((*t)[0]);
    if (head == "MATERIAL" && t->size() >= 2) {
      if (!parse_material(r, *sc, (int)std::strtof((*t)[1].c_str(), nullptr)))
        return sc;
    } else if (head == "CAMERA") {
      if (!parse_camera(r, *sc)) return sc;
    } else if (head == "OBJECT" && t->size() >= 2) {
      if (!parse_object(r, *sc, (int)std::strtof((*t)[1].c_str(), nullptr)))
        return sc;
    } else {
      sc->error = "unexpected token " + (*t)[0];
      return sc;
    }
  }
  if (sc->camera.eye.empty() && sc->error.empty()) sc->error = "no CAMERA block";
  if (sc->objects.empty() && sc->error.empty()) sc->error = "no OBJECT blocks";
  // validate frame counts + material refs (scene.cpp:37-39,222-224 analog)
  if (sc->error.empty()) {
    size_t f = sc->camera.eye.size();
    for (auto& o : sc->objects) {
      if (o.trans.size() != f) { sc->error = "object frame count mismatch"; break; }
      if (o.material >= (int)sc->materials.size()) {
        sc->error = "object references missing material";
        break;
      }
    }
  }
  return sc;
}

// ---------------------------------------------------------------------------
// Image encoding (PNG via zlib, BMP 24bpp BI_RGB)
// ---------------------------------------------------------------------------

void put32be(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
}

void png_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
  put32be(out, (uint32_t)len);
  size_t start = out.size();
  out.insert(out.end(), tag, tag + 4);
  out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0, out.data() + start, (uInt)(len + 4));
  put32be(out, crc);
}

bool encode_png(const uint8_t* rgb, int w, int h, std::vector<uint8_t>& out) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  out.assign(sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8; ihdr[9] = 2; ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  png_chunk(out, "IHDR", ihdr, 13);

  std::vector<uint8_t> raw((size_t)h * (w * 3 + 1));
  for (int y = 0; y < h; y++) {
    raw[(size_t)y * (w * 3 + 1)] = 0;  // filter: none
    std::memcpy(&raw[(size_t)y * (w * 3 + 1) + 1], rgb + (size_t)y * w * 3,
                (size_t)w * 3);
  }
  uLongf zlen = compressBound((uLong)raw.size());
  std::vector<uint8_t> z(zlen);
  if (compress2(z.data(), &zlen, raw.data(), (uLong)raw.size(), 6) != Z_OK)
    return false;
  png_chunk(out, "IDAT", z.data(), zlen);
  png_chunk(out, "IEND", nullptr, 0);
  return true;
}

void encode_bmp(const uint8_t* rgb, int w, int h, std::vector<uint8_t>& out) {
  int pad = (4 - (w * 3) % 4) % 4;
  uint32_t body = (uint32_t)((w * 3 + pad) * h);
  uint32_t off = 14 + 40;
  out.clear();
  out.reserve(off + body);
  auto put16 = [&](uint16_t x) { out.push_back(x); out.push_back(x >> 8); };
  auto put32 = [&](uint32_t x) {
    out.push_back(x); out.push_back(x >> 8); out.push_back(x >> 16); out.push_back(x >> 24);
  };
  out.push_back('B'); out.push_back('M');
  put32(off + body); put16(0); put16(0); put32(off);
  put32(40); put32((uint32_t)w); put32((uint32_t)h); put16(1); put16(24);
  put32(0); put32(body); put32(2835); put32(2835); put32(0); put32(0);
  for (int y = h - 1; y >= 0; y--) {  // bottom-up, BGR
    for (int x = 0; x < w; x++) {
      const uint8_t* p = rgb + ((size_t)y * w + x) * 3;
      out.push_back(p[2]); out.push_back(p[1]); out.push_back(p[0]);
    }
    for (int k = 0; k < pad; k++) out.push_back(0);
  }
}

bool write_file(const char* path, const std::vector<uint8_t>& data) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  size_t n = std::fwrite(data.data(), 1, data.size(), f);
  std::fclose(f);
  return n == data.size();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* pt_parse_scene(const char* text) { return parse(text); }

const char* pt_scene_error(void* h) {
  auto* sc = (ParsedScene*)h;
  return sc->error.empty() ? nullptr : sc->error.c_str();
}

int pt_num_materials(void* h) { return (int)((ParsedScene*)h)->materials.size(); }
int pt_num_objects(void* h) { return (int)((ParsedScene*)h)->objects.size(); }
int pt_num_frames(void* h) { return (int)((ParsedScene*)h)->camera.eye.size(); }
int pt_iterations(void* h) { return ((ParsedScene*)h)->camera.iterations; }
float pt_fovy(void* h) { return ((ParsedScene*)h)->camera.fovy; }
float pt_aperture(void* h) { return ((ParsedScene*)h)->camera.aperture; }
float pt_focal(void* h) { return ((ParsedScene*)h)->camera.focal; }
const char* pt_image_name(void* h) { return ((ParsedScene*)h)->camera.file.c_str(); }

void pt_resolution(void* h, int* wh) {
  auto* sc = (ParsedScene*)h;
  wh[0] = sc->camera.res[0];
  wh[1] = sc->camera.res[1];
}

// materials flattened [M, 14]: rgb(3) specex(1) specrgb(3) refl refr
// refrior scatter abscoeff(3)... -> laid out to match the python side
void pt_materials(void* h, float* out) {
  auto* sc = (ParsedScene*)h;
  for (auto& m : sc->materials) {
    *out++ = m.rgb[0]; *out++ = m.rgb[1]; *out++ = m.rgb[2];
    *out++ = m.specex;
    *out++ = m.specrgb[0]; *out++ = m.specrgb[1]; *out++ = m.specrgb[2];
    *out++ = m.refl; *out++ = m.refr; *out++ = m.refrior; *out++ = m.scatter;
    *out++ = m.abscoeff[0]; *out++ = m.abscoeff[1]; *out++ = m.abscoeff[2];
    *out++ = m.rsctcoeff; *out++ = m.emittance;
  }
}

void pt_objects(void* h, int* types, int* mats) {
  auto* sc = (ParsedScene*)h;
  for (size_t i = 0; i < sc->objects.size(); i++) {
    types[i] = sc->objects[i].type;
    mats[i] = sc->objects[i].material;
  }
}

// [F, G, 3] row-major each
void pt_object_frames(void* h, float* trans, float* rotat, float* scale) {
  auto* sc = (ParsedScene*)h;
  int F = (int)sc->camera.eye.size(), G = (int)sc->objects.size();
  for (int f = 0; f < F; f++)
    for (int g = 0; g < G; g++)
      for (int k = 0; k < 3; k++) {
        size_t idx = ((size_t)f * G + g) * 3 + k;
        trans[idx] = sc->objects[g].trans[f].v[k];
        rotat[idx] = sc->objects[g].rotat[f].v[k];
        scale[idx] = sc->objects[g].scale[f].v[k];
      }
}

// [F, 3] each
void pt_camera_frames(void* h, float* eye, float* view, float* up) {
  auto* sc = (ParsedScene*)h;
  int F = (int)sc->camera.eye.size();
  for (int f = 0; f < F; f++)
    for (int k = 0; k < 3; k++) {
      eye[(size_t)f * 3 + k] = sc->camera.eye[f].v[k];
      view[(size_t)f * 3 + k] = sc->camera.view[f].v[k];
      up[(size_t)f * 3 + k] = sc->camera.up[f].v[k];
    }
}

void pt_free_scene(void* h) { delete (ParsedScene*)h; }

int pt_write_png(const char* path, const uint8_t* rgb, int w, int h) {
  std::vector<uint8_t> out;
  if (!encode_png(rgb, w, h, out)) return 0;
  return write_file(path, out) ? 1 : 0;
}

int pt_write_bmp(const char* path, const uint8_t* rgb, int w, int h) {
  std::vector<uint8_t> out;
  encode_bmp(rgb, w, h, out);
  return write_file(path, out) ? 1 : 0;
}

}  // extern "C"
