// Exported-bundle loader shared by pjrt_runner and the native extractor.
// Format written by asv_subtools_tpu/export.py export_pjrt_bundle.
#ifndef ASVTPU_RUNTIME_PJRT_BUNDLE_H_
#define ASVTPU_RUNTIME_PJRT_BUNDLE_H_

#include <cstdint>
#include <string>
#include <vector>

#include "pjrt_executor.h"

namespace asvtpu {

struct ArgSpec {
  std::string dtype;
  bool baked = false;  // true: slice of params blob; false: fed at run time
  uint64_t offset = 0;
  uint64_t nbytes = 0;
  std::vector<int64_t> dims;
};

struct Bundle {
  std::string mlir;
  std::string compile_options;
  std::string params;  // baked-leaf blob (possibly shared across bundles)
  std::vector<ArgSpec> args;
};

std::string ReadFileToString(const std::string& path, bool* ok);

// Load manifest.txt + referenced files from `dir`. Returns false + error.
bool LoadBundle(const std::string& dir, Bundle* b, std::string* error);

// Materialize the baked args of `b` into `inputs` (resized to all args;
// runtime args get dims/dtype set and zero-filled data).
bool MaterializeInputs(const Bundle& b, std::vector<HostArray>* inputs,
                       std::string* error);

}  // namespace asvtpu

#endif  // ASVTPU_RUNTIME_PJRT_BUNDLE_H_
