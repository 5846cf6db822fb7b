// Native PJRT executor: dlopen a PJRT plugin (libtpu / axon), compile an
// exported StableHLO module, execute with host buffers. Zero Python in the
// serving path.
//
// This is the TPU-native answer to the reference's C++ runtime executors
// (subtools/runtime/... online extractor stack): the reference embeds
// libtorch for CPU inference; here the model is AOT-exported from JAX
// (asv_subtools_tpu/export.py export_pjrt_bundle) and driven through the
// PJRT C API, so the same binary runs against any PJRT plugin.
//
// PJRT C API compatibility: the header is append-only (struct_size guards);
// we zero-init every arg struct and only touch fields present since API
// v0.41, so a v0.54 plugin (axon) and current libtpu both work.
#ifndef ASVTPU_RUNTIME_PJRT_EXECUTOR_H_
#define ASVTPU_RUNTIME_PJRT_EXECUTOR_H_

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

// Forward-declare the C API types; the .cc includes the real header.
typedef struct PJRT_Api PJRT_Api;
typedef struct PJRT_Client PJRT_Client;
typedef struct PJRT_Device PJRT_Device;
typedef struct PJRT_LoadedExecutable PJRT_LoadedExecutable;
typedef struct PJRT_Buffer PJRT_Buffer;

namespace asvtpu {

// Host-side array: dense row-major buffer + shape + dtype tag.
struct HostArray {
  std::string dtype;  // "f32" | "bf16" | "f16" | "s32" | "s64" | "u8" | "s8" | "pred"
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;

  size_t num_elements() const {
    size_t n = 1;
    for (int64_t d : dims) n *= static_cast<size_t>(d);
    return n;
  }
};

size_t DtypeBytes(const std::string& dtype);

// One named create-option for PJRT_Client_Create (string or int64).
struct ClientOption {
  std::string name;
  bool is_string = true;
  std::string str_value;
  int64_t int_value = 0;
};

// Per-execute stage timing (filled by ExecuteModule; read via last_stats()).
// With lazy/batching plugins the H2D transfer is flushed by the execute
// barrier, so `enqueue_s` is the host-side BufferFromHostBuffer cost and
// `execute_s` includes the flushed upload + device compute.
struct ExecStats {
  double enqueue_s = 0;   // BufferFromHostBuffer calls (host enqueue)
  double execute_s = 0;   // Execute + execute-done await (incl. lazy H2D)
  double download_s = 0;  // ToHostBuffer + await
  size_t upload_bytes = 0;    // non-cached args enqueued this call
  size_t download_bytes = 0;  // outputs copied back
};

class PjrtExecutor {
 public:
  ~PjrtExecutor();

  // dlopen `so_path`, GetPjrtApi, PJRT_Plugin_Initialize,
  // PJRT_Client_Create(options). Returns nullptr + fills `error` on failure.
  static std::unique_ptr<PjrtExecutor> Create(
      const std::string& so_path, const std::vector<ClientOption>& options,
      std::string* error);

  // Compile an MLIR (StableHLO) module. `compile_options` is a serialized
  // xla CompileOptionsProto (produced at export time by jaxlib). Returns a
  // module handle (>= 0), or -1 on failure. One client may hold many
  // compiled modules (e.g. one embed executable per bucket length).
  int CompileModule(const std::string& mlir_module,
                    const std::string& compile_options, std::string* error);

  // Synchronous single-device execute of module `handle`: upload inputs,
  // run, download outputs. `persistent` (optional, per-arg) marks inputs
  // whose device buffers should be uploaded once and reused across calls
  // (model weights in a serving loop): the first execute uploads and
  // caches them; later executes skip the H2D entirely.
  bool ExecuteModule(int handle, const std::vector<HostArray>& inputs,
                     std::vector<HostArray>* outputs, std::string* error,
                     const std::vector<bool>* persistent = nullptr);

  // Single-module convenience (used by pjrt_runner).
  bool Compile(const std::string& mlir_module,
               const std::string& compile_options, std::string* error) {
    return CompileModule(mlir_module, compile_options, error) >= 0;
  }
  bool Execute(const std::vector<HostArray>& inputs,
               std::vector<HostArray>* outputs, std::string* error) {
    return ExecuteModule(static_cast<int>(executables_.size()) - 1, inputs,
                         outputs, error);
  }

  const ExecStats& last_stats() const { return last_stats_; }

  const std::string& platform_name() const { return platform_name_; }
  const std::string& platform_version() const { return platform_version_; }
  int num_devices() const { return num_devices_; }
  size_t num_outputs() const {
    return executables_.empty() ? 0 : executables_.back().num_outputs;
  }

 private:
  PjrtExecutor() = default;

  struct CompiledModule {
    PJRT_LoadedExecutable* executable = nullptr;
    size_t num_outputs = 0;
    std::vector<PJRT_Buffer*> cached_args;  // persistent-arg device buffers
  };

  ExecStats last_stats_;
  const PJRT_Api* api_ = nullptr;
  void* dl_handle_ = nullptr;
  PJRT_Client* client_ = nullptr;
  PJRT_Device* device_ = nullptr;  // first addressable device
  std::vector<CompiledModule> executables_;
  std::string platform_name_;
  std::string platform_version_;
  int num_devices_ = 0;
};

}  // namespace asvtpu

#endif  // ASVTPU_RUNTIME_PJRT_EXECUTOR_H_
