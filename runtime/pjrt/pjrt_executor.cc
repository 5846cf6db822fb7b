#include "pjrt_executor.h"

#include <dlfcn.h>

#include <chrono>
#include <cstring>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace asvtpu {

namespace {

std::string ErrorMessage(const PJRT_Api* api, PJRT_Error* err) {
  if (err == nullptr) return "";
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  api->PJRT_Error_Destroy(&dargs);
  return msg;
}

// Returns false + fills *error if err != nullptr (consuming err).
bool Ok(const PJRT_Api* api, PJRT_Error* err, const char* what,
        std::string* error) {
  if (err == nullptr) return true;
  *error = std::string(what) + ": " + ErrorMessage(api, err);
  return false;
}

bool AwaitEvent(const PJRT_Api* api, PJRT_Event* event, const char* what,
                std::string* error) {
  if (event == nullptr) return true;
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  PJRT_Error* err = api->PJRT_Event_Await(&args);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  api->PJRT_Event_Destroy(&dargs);
  return Ok(api, err, what, error);
}

PJRT_Buffer_Type DtypeToPjrt(const std::string& dtype) {
  if (dtype == "f32") return PJRT_Buffer_Type_F32;
  if (dtype == "bf16") return PJRT_Buffer_Type_BF16;
  if (dtype == "f16") return PJRT_Buffer_Type_F16;
  if (dtype == "f64") return PJRT_Buffer_Type_F64;
  if (dtype == "s32") return PJRT_Buffer_Type_S32;
  if (dtype == "s64") return PJRT_Buffer_Type_S64;
  if (dtype == "u8") return PJRT_Buffer_Type_U8;
  if (dtype == "s8") return PJRT_Buffer_Type_S8;
  if (dtype == "u32") return PJRT_Buffer_Type_U32;
  if (dtype == "pred") return PJRT_Buffer_Type_PRED;
  return PJRT_Buffer_Type_INVALID;
}

std::string PjrtToDtype(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: return "f32";
    case PJRT_Buffer_Type_BF16: return "bf16";
    case PJRT_Buffer_Type_S8: return "s8";
    case PJRT_Buffer_Type_F16: return "f16";
    case PJRT_Buffer_Type_F64: return "f64";
    case PJRT_Buffer_Type_S32: return "s32";
    case PJRT_Buffer_Type_S64: return "s64";
    case PJRT_Buffer_Type_U8: return "u8";
    case PJRT_Buffer_Type_U32: return "u32";
    case PJRT_Buffer_Type_PRED: return "pred";
    default: return "unknown";
  }
}

}  // namespace

size_t DtypeBytes(const std::string& dtype) {
  if (dtype == "f64" || dtype == "s64") return 8;
  if (dtype == "f32" || dtype == "s32" || dtype == "u32") return 4;
  if (dtype == "bf16" || dtype == "f16") return 2;
  return 1;  // u8 / s8 / pred
}

std::unique_ptr<PjrtExecutor> PjrtExecutor::Create(
    const std::string& so_path, const std::vector<ClientOption>& options,
    std::string* error) {
  void* handle = dlopen(so_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (handle == nullptr) {
    *error = std::string("dlopen failed: ") + dlerror();
    return nullptr;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(handle, "GetPjrtApi"));
  if (get_api == nullptr) {
    *error = "GetPjrtApi not found in " + so_path;
    dlclose(handle);
    return nullptr;
  }
  const PJRT_Api* api = get_api();

  std::unique_ptr<PjrtExecutor> ex(new PjrtExecutor());
  ex->api_ = api;
  ex->dl_handle_ = handle;

  {
    PJRT_Plugin_Initialize_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    if (!Ok(api, api->PJRT_Plugin_Initialize(&args), "Plugin_Initialize",
            error)) {
      return nullptr;
    }
  }

  // Marshal create options into PJRT_NamedValues.
  std::vector<PJRT_NamedValue> nvs(options.size());
  for (size_t i = 0; i < options.size(); ++i) {
    std::memset(&nvs[i], 0, sizeof(PJRT_NamedValue));
    nvs[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nvs[i].name = options[i].name.c_str();
    nvs[i].name_size = options[i].name.size();
    if (options[i].is_string) {
      nvs[i].type = PJRT_NamedValue_kString;
      nvs[i].string_value = options[i].str_value.c_str();
      nvs[i].value_size = options[i].str_value.size();
    } else {
      nvs[i].type = PJRT_NamedValue_kInt64;
      nvs[i].int64_value = options[i].int_value;
      nvs[i].value_size = 1;
    }
  }

  {
    PJRT_Client_Create_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    args.create_options = nvs.data();
    args.num_options = nvs.size();
    if (!Ok(api, api->PJRT_Client_Create(&args), "Client_Create", error)) {
      return nullptr;
    }
    ex->client_ = args.client;
  }

  {
    PJRT_Client_PlatformName_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
    args.client = ex->client_;
    if (Ok(api, api->PJRT_Client_PlatformName(&args), "PlatformName", error)) {
      ex->platform_name_.assign(args.platform_name, args.platform_name_size);
    }
  }
  {
    PJRT_Client_PlatformVersion_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_PlatformVersion_Args_STRUCT_SIZE;
    args.client = ex->client_;
    if (Ok(api, api->PJRT_Client_PlatformVersion(&args), "PlatformVersion",
           error)) {
      ex->platform_version_.assign(args.platform_version,
                                   args.platform_version_size);
    }
  }
  {
    PJRT_Client_AddressableDevices_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    args.client = ex->client_;
    if (!Ok(api, api->PJRT_Client_AddressableDevices(&args),
            "AddressableDevices", error)) {
      return nullptr;
    }
    ex->num_devices_ = static_cast<int>(args.num_addressable_devices);
    if (args.num_addressable_devices == 0) {
      *error = "no addressable devices";
      return nullptr;
    }
    ex->device_ = args.addressable_devices[0];
  }
  error->clear();
  return ex;
}

int PjrtExecutor::CompileModule(const std::string& mlir_module,
                                const std::string& compile_options,
                                std::string* error) {
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir_module.data());
  program.code_size = mlir_module.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.client = client_;
  args.program = &program;
  args.compile_options = compile_options.data();
  args.compile_options_size = compile_options.size();
  if (!Ok(api_, api_->PJRT_Client_Compile(&args), "Compile", error)) {
    return -1;
  }
  CompiledModule mod;
  mod.executable = args.executable;

  // Output arity (via the underlying PJRT_Executable).
  PJRT_LoadedExecutable_GetExecutable_Args gargs;
  std::memset(&gargs, 0, sizeof(gargs));
  gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gargs.loaded_executable = mod.executable;
  if (!Ok(api_, api_->PJRT_LoadedExecutable_GetExecutable(&gargs),
          "GetExecutable", error)) {
    return -1;
  }
  PJRT_Executable_NumOutputs_Args nargs;
  std::memset(&nargs, 0, sizeof(nargs));
  nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  nargs.executable = gargs.executable;
  if (!Ok(api_, api_->PJRT_Executable_NumOutputs(&nargs), "NumOutputs",
          error)) {
    return -1;
  }
  mod.num_outputs = nargs.num_outputs;
  executables_.push_back(mod);
  return static_cast<int>(executables_.size()) - 1;
}

bool PjrtExecutor::ExecuteModule(int handle,
                                 const std::vector<HostArray>& inputs,
                                 std::vector<HostArray>* outputs,
                                 std::string* error,
                                 const std::vector<bool>* persistent) {
  if (handle < 0 || static_cast<size_t>(handle) >= executables_.size()) {
    *error = "Execute before Compile / bad module handle";
    return false;
  }
  CompiledModule& module_entry = executables_[handle];
  PJRT_LoadedExecutable* executable = module_entry.executable;
  const size_t num_outputs = module_entry.num_outputs;
  if (module_entry.cached_args.empty())
    module_entry.cached_args.assign(inputs.size(), nullptr);
  auto is_persistent = [&](size_t i) {
    return persistent != nullptr && i < persistent->size() && (*persistent)[i];
  };
  std::vector<PJRT_Buffer*> arg_buffers(inputs.size(), nullptr);
  std::vector<PJRT_Event*> upload_events(inputs.size(), nullptr);
  last_stats_ = ExecStats();
  auto now = [] { return std::chrono::steady_clock::now(); };
  auto secs = [](auto a, auto b) {
    return std::chrono::duration<double>(b - a).count();
  };
  auto t_enq0 = now();

  auto destroy_buffer = [&](PJRT_Buffer* b) {
    if (b == nullptr) return;
    PJRT_Buffer_Destroy_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    dargs.buffer = b;
    api_->PJRT_Buffer_Destroy(&dargs);
  };
  auto cleanup_buffers = [&](std::vector<PJRT_Buffer*>& bufs) {
    for (PJRT_Buffer* b : bufs) destroy_buffer(b);
  };
  // Destroy only the arg buffers this call created (cached persistent
  // buffers survive across executes).
  auto cleanup_args = [&]() {
    for (size_t i = 0; i < arg_buffers.size(); ++i) {
      if (is_persistent(i) && arg_buffers[i] == module_entry.cached_args[i])
        continue;
      destroy_buffer(arg_buffers[i]);
    }
  };

  for (size_t i = 0; i < inputs.size(); ++i) {
    if (is_persistent(i) && module_entry.cached_args[i] != nullptr) {
      arg_buffers[i] = module_entry.cached_args[i];
      continue;
    }
    const HostArray& in = inputs[i];
    PJRT_Buffer_Type type = DtypeToPjrt(in.dtype);
    if (type == PJRT_Buffer_Type_INVALID) {
      *error = "unsupported input dtype " + in.dtype;
      cleanup_args();
      return false;
    }
    PJRT_Client_BufferFromHostBuffer_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    args.client = client_;
    args.data = in.data.data();
    args.type = type;
    args.dims = in.dims.data();
    args.num_dims = in.dims.size();
    args.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    args.device = device_;
    if (!Ok(api_, api_->PJRT_Client_BufferFromHostBuffer(&args),
            "BufferFromHostBuffer", error)) {
      cleanup_args();
      return false;
    }
    arg_buffers[i] = args.buffer;
    if (is_persistent(i)) module_entry.cached_args[i] = args.buffer;
    upload_events[i] = args.done_with_host_buffer;
    last_stats_.upload_bytes += in.data.size();
  }
  last_stats_.enqueue_s = secs(t_enq0, now());
  // Do NOT await the upload events yet: lazy/batching plugins (the axon
  // frontend journals ops and flushes at a barrier) may only complete
  // host-buffer transfers once an execute forces a flush — awaiting here
  // would deadlock with many arguments. Host data stays alive for the
  // whole call; the events are awaited after the execute completes.

  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  std::vector<PJRT_Buffer*> out_buffers(num_outputs, nullptr);
  PJRT_Buffer* const* arg_list = arg_buffers.data();
  PJRT_Buffer** out_list = out_buffers.data();
  PJRT_Event* done_event = nullptr;

  PJRT_LoadedExecutable_Execute_Args eargs;
  std::memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  eargs.executable = executable;
  eargs.options = &opts;
  eargs.argument_lists = &arg_list;
  eargs.num_devices = 1;
  eargs.num_args = arg_buffers.size();
  eargs.output_lists = &out_list;
  eargs.device_complete_events = &done_event;

  auto t_exec0 = now();
  bool ok = Ok(api_, api_->PJRT_LoadedExecutable_Execute(&eargs), "Execute",
               error);
  if (ok) ok = AwaitEvent(api_, done_event, "execute-done", error);
  last_stats_.execute_s = secs(t_exec0, now());
  for (size_t i = 0; i < upload_events.size(); ++i) {
    std::string upload_error;
    if (!AwaitEvent(api_, upload_events[i], "upload", &upload_error) && ok) {
      *error = upload_error;
      ok = false;
    }
  }
  cleanup_args();
  if (!ok) {
    cleanup_buffers(out_buffers);
    return false;
  }

  outputs->clear();
  outputs->resize(num_outputs);
  auto t_dl0 = now();
  for (size_t i = 0; i < num_outputs; ++i) {
    HostArray& out = (*outputs)[i];
    {
      PJRT_Buffer_ElementType_Args targs;
      std::memset(&targs, 0, sizeof(targs));
      targs.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      targs.buffer = out_buffers[i];
      if (!Ok(api_, api_->PJRT_Buffer_ElementType(&targs), "ElementType",
              error)) {
        cleanup_buffers(out_buffers);
        return false;
      }
      out.dtype = PjrtToDtype(targs.type);
    }
    {
      PJRT_Buffer_Dimensions_Args dargs;
      std::memset(&dargs, 0, sizeof(dargs));
      dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
      dargs.buffer = out_buffers[i];
      if (!Ok(api_, api_->PJRT_Buffer_Dimensions(&dargs), "Dimensions",
              error)) {
        cleanup_buffers(out_buffers);
        return false;
      }
      out.dims.assign(dargs.dims, dargs.dims + dargs.num_dims);
    }
    // Two-phase ToHostBuffer: query size, then copy.
    PJRT_Buffer_ToHostBuffer_Args hargs;
    std::memset(&hargs, 0, sizeof(hargs));
    hargs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    hargs.src = out_buffers[i];
    if (!Ok(api_, api_->PJRT_Buffer_ToHostBuffer(&hargs), "ToHostBuffer(size)",
            error)) {
      cleanup_buffers(out_buffers);
      return false;
    }
    out.data.resize(hargs.dst_size);
    hargs.dst = out.data.data();
    if (!Ok(api_, api_->PJRT_Buffer_ToHostBuffer(&hargs), "ToHostBuffer",
            error)) {
      cleanup_buffers(out_buffers);
      return false;
    }
    if (!AwaitEvent(api_, hargs.event, "download", error)) {
      cleanup_buffers(out_buffers);
      return false;
    }
    last_stats_.download_bytes += out.data.size();
  }
  last_stats_.download_s = secs(t_dl0, now());
  cleanup_buffers(out_buffers);
  return true;
}

PjrtExecutor::~PjrtExecutor() {
  if (api_ != nullptr) {
    for (const CompiledModule& mod : executables_) {
      for (PJRT_Buffer* b : mod.cached_args) {
        if (b == nullptr) continue;
        PJRT_Buffer_Destroy_Args dargs;
        std::memset(&dargs, 0, sizeof(dargs));
        dargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        dargs.buffer = b;
        api_->PJRT_Buffer_Destroy(&dargs);
      }
      PJRT_LoadedExecutable_Destroy_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
      args.executable = mod.executable;
      api_->PJRT_LoadedExecutable_Destroy(&args);
    }
    if (client_ != nullptr) {
      PJRT_Client_Destroy_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
      args.client = client_;
      api_->PJRT_Client_Destroy(&args);
    }
  }
  // Leave the .so mapped: plugin background threads may still reference it.
}

}  // namespace asvtpu
