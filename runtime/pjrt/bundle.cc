#include "bundle.h"

#include <fstream>
#include <sstream>

namespace asvtpu {

std::string ReadFileToString(const std::string& path, bool* ok) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    *ok = false;
    return "";
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  *ok = true;
  return ss.str();
}

bool LoadBundle(const std::string& dir, Bundle* b, std::string* error) {
  bool ok = false;
  std::string manifest = ReadFileToString(dir + "/manifest.txt", &ok);
  if (!ok) {
    *error = "cannot read " + dir + "/manifest.txt";
    return false;
  }
  std::string mlir_file = "model.mlir", co_file = "compile_options.pb",
              params_file = "params.bin";
  std::istringstream lines(manifest);
  std::string line;
  while (std::getline(lines, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ls(line);
    std::string kind;
    ls >> kind;
    if (kind == "mlir") {
      ls >> mlir_file;
    } else if (kind == "compile_options") {
      ls >> co_file;
    } else if (kind == "params") {
      ls >> params_file;
    } else if (kind == "arg") {
      int idx;
      ArgSpec spec;
      std::string source;
      size_t ndim;
      ls >> idx >> spec.dtype >> source >> spec.offset >> spec.nbytes >> ndim;
      spec.baked = (source == "param");
      spec.dims.resize(ndim);
      for (size_t i = 0; i < ndim; ++i) ls >> spec.dims[i];
      if (static_cast<size_t>(idx) != b->args.size()) {
        *error = "manifest args out of order";
        return false;
      }
      b->args.push_back(spec);
    }
  }
  b->mlir = ReadFileToString(dir + "/" + mlir_file, &ok);
  if (!ok) {
    *error = "cannot read " + mlir_file;
    return false;
  }
  b->compile_options = ReadFileToString(dir + "/" + co_file, &ok);
  if (!ok) {
    *error = "cannot read " + co_file;
    return false;
  }
  bool any_baked = false;
  for (const auto& a : b->args) any_baked |= a.baked;
  if (any_baked) {
    b->params = ReadFileToString(dir + "/" + params_file, &ok);
    if (!ok) {
      *error = "cannot read " + params_file;
      return false;
    }
  }
  return true;
}

bool MaterializeInputs(const Bundle& b, std::vector<HostArray>* inputs,
                       std::string* error) {
  inputs->clear();
  inputs->resize(b.args.size());
  for (size_t i = 0; i < b.args.size(); ++i) {
    const ArgSpec& spec = b.args[i];
    HostArray& in = (*inputs)[i];
    in.dtype = spec.dtype;
    in.dims = spec.dims;
    size_t want = in.num_elements() * DtypeBytes(spec.dtype);
    if (spec.baked) {
      if (spec.offset + spec.nbytes > b.params.size() || spec.nbytes != want) {
        *error = "arg " + std::to_string(i) + ": bad params range";
        return false;
      }
      in.data.assign(b.params.begin() + spec.offset,
                     b.params.begin() + spec.offset + spec.nbytes);
    } else {
      in.data.assign(want, 0);
    }
  }
  return true;
}

}  // namespace asvtpu
