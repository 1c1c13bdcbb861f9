// Mock PJRT plugin for contract-testing pjrt_serve.cc without hardware.
//
// Implements the minimal PJRT C API subset the serving host drives:
// one fake device whose "device memory" is host memory, Compile that
// validates the program wiring (format "mlir", non-empty StableHLO
// text) but does no compilation, and Execute whose defined semantics
// are: ONE output = an elementwise copy of the LAST argument buffer.
// The test exports a real bundle, serves it through the host against
// this plugin, and asserts output == last input — which exercises every
// host code path (manifest/npz/npy parsing, operand ordering, buffer
// upload dims/dtypes, execute marshaling, D2H, npy write) hermetically.
//
// This mirrors how XLA itself contract-tests the C API (a test plugin
// behind GetPjrtApi); it is NOT a fake TPU — numerical correctness of
// the artifacts is proven separately by compiling them on the real
// in-process CPU backend (tests/test_pjrt_host.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct MockError {
  std::string message;
};

struct MockEvent {};  // always ready, never fails

struct MockBuffer {
  PJRT_Buffer_Type type;
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;
};

struct MockExecutable {
  size_t program_size = 0;
};

struct MockClient {
  int device_tag = 0;  // its address serves as the PJRT_Device*
};

size_t type_size(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F64:
    case PJRT_Buffer_Type_S64:
    case PJRT_Buffer_Type_U64: return 8;
    case PJRT_Buffer_Type_F32:
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32: return 4;
    case PJRT_Buffer_Type_F16:
    case PJRT_Buffer_Type_BF16:
    case PJRT_Buffer_Type_S16:
    case PJRT_Buffer_Type_U16: return 2;
    default: return 1;
  }
}

PJRT_Error* err(const std::string& m) {
  return reinterpret_cast<PJRT_Error*>(new MockError{m});
}

// ---- errors ----
void ErrorDestroy(PJRT_Error_Destroy_Args* a) {
  delete reinterpret_cast<MockError*>(a->error);
}
void ErrorMessage(PJRT_Error_Message_Args* a) {
  auto* e = reinterpret_cast<const MockError*>(a->error);
  a->message = e->message.c_str();
  a->message_size = e->message.size();
}
PJRT_Error* ErrorGetCode(PJRT_Error_GetCode_Args* a) {
  a->code = PJRT_Error_Code_INTERNAL;
  return nullptr;
}

// ---- plugin / events ----
PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) { return nullptr; }
PJRT_Error* EventAwait(PJRT_Event_Await_Args*) { return nullptr; }
PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args* a) {
  delete reinterpret_cast<MockEvent*>(a->event);
  return nullptr;
}

// ---- client ----
PJRT_Error* ClientCreate(PJRT_Client_Create_Args* a) {
  a->client = reinterpret_cast<PJRT_Client*>(new MockClient());
  return nullptr;
}
PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args* a) {
  delete reinterpret_cast<MockClient*>(a->client);
  return nullptr;
}
PJRT_Error* ClientPlatformName(PJRT_Client_PlatformName_Args* a) {
  static const char kName[] = "mock";
  a->platform_name = kName;
  a->platform_name_size = 4;
  return nullptr;
}
PJRT_Error* ClientAddressableDevices(PJRT_Client_AddressableDevices_Args* a) {
  auto* c = reinterpret_cast<MockClient*>(a->client);
  // one device; its handle is the address of device_tag
  static thread_local PJRT_Device* dev;
  dev = reinterpret_cast<PJRT_Device*>(&c->device_tag);
  a->addressable_devices = &dev;
  a->num_addressable_devices = 1;
  return nullptr;
}

// ---- compile ----
PJRT_Error* ClientCompile(PJRT_Client_Compile_Args* a) {
  const PJRT_Program* p = a->program;
  if (std::string(p->format, p->format_size) != "mlir")
    return err("mock plugin: program format must be 'mlir'");
  // scan the WHOLE program: a module printed with debug info front-loads
  // arbitrarily many #loc lines, so a fixed-size prefix sniff is brittle
  std::string code(p->code, p->code_size);
  if (code.find("stablehlo") == std::string::npos &&
      code.find("func.func") == std::string::npos)
    return err("mock plugin: program does not look like StableHLO");
  if (a->compile_options_size == 0)
    return err("mock plugin: empty compile options");
  auto* e = new MockExecutable();
  e->program_size = p->code_size;
  a->executable = reinterpret_cast<PJRT_LoadedExecutable*>(e);
  return nullptr;
}

// ---- executable ----
PJRT_Error* LoadedGetExecutable(PJRT_LoadedExecutable_GetExecutable_Args* a) {
  // hand back the same object; Executable_Destroy is a no-op for it
  a->executable = reinterpret_cast<PJRT_Executable*>(a->loaded_executable);
  return nullptr;
}
PJRT_Error* ExecutableNumOutputs(PJRT_Executable_NumOutputs_Args* a) {
  a->num_outputs = 1;
  return nullptr;
}
PJRT_Error* ExecutableDestroy(PJRT_Executable_Destroy_Args*) {
  return nullptr;  // alias of the loaded executable — freed there
}
PJRT_Error* LoadedDestroy(PJRT_LoadedExecutable_Destroy_Args* a) {
  delete reinterpret_cast<MockExecutable*>(a->executable);
  return nullptr;
}

PJRT_Error* LoadedExecute(PJRT_LoadedExecutable_Execute_Args* a) {
  if (a->num_devices != 1) return err("mock plugin: num_devices must be 1");
  if (a->num_args == 0) return err("mock plugin: no arguments");
  const MockBuffer* last =
      reinterpret_cast<const MockBuffer*>(a->argument_lists[0][a->num_args - 1]);
  auto* out = new MockBuffer(*last);  // output[0] = copy of last input
  a->output_lists[0][0] = reinterpret_cast<PJRT_Buffer*>(out);
  if (a->device_complete_events)
    a->device_complete_events[0] = reinterpret_cast<PJRT_Event*>(new MockEvent());
  return nullptr;
}

// ---- buffers ----
PJRT_Error* BufferFromHost(PJRT_Client_BufferFromHostBuffer_Args* a) {
  if (a->num_byte_strides != 0)
    return err("mock plugin: byte_strides unsupported");
  auto* b = new MockBuffer();
  b->type = a->type;
  b->dims.assign(a->dims, a->dims + a->num_dims);
  size_t n = type_size(a->type);
  for (size_t i = 0; i < a->num_dims; ++i) n *= a->dims[i];
  b->data.assign(static_cast<const uint8_t*>(a->data),
                 static_cast<const uint8_t*>(a->data) + n);
  a->buffer = reinterpret_cast<PJRT_Buffer*>(b);
  a->done_with_host_buffer = reinterpret_cast<PJRT_Event*>(new MockEvent());
  return nullptr;
}
PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* a) {
  delete reinterpret_cast<MockBuffer*>(a->buffer);
  return nullptr;
}
PJRT_Error* BufferElementType(PJRT_Buffer_ElementType_Args* a) {
  a->type = reinterpret_cast<const MockBuffer*>(a->buffer)->type;
  return nullptr;
}
PJRT_Error* BufferDimensions(PJRT_Buffer_Dimensions_Args* a) {
  const auto* b = reinterpret_cast<const MockBuffer*>(a->buffer);
  a->dims = b->dims.data();
  a->num_dims = b->dims.size();
  return nullptr;
}
PJRT_Error* BufferToHost(PJRT_Buffer_ToHostBuffer_Args* a) {
  const auto* b = reinterpret_cast<const MockBuffer*>(a->src);
  if (a->dst == nullptr) {
    a->dst_size = b->data.size();
  } else {
    if (a->dst_size < b->data.size())
      return err("mock plugin: dst too small");
    std::memcpy(a->dst, b->data.data(), b->data.size());
  }
  a->event = reinterpret_cast<PJRT_Event*>(new MockEvent());
  return nullptr;
}

PJRT_Api make_api() {
  PJRT_Api api{};
  api.struct_size = PJRT_Api_STRUCT_SIZE;
  api.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
  api.pjrt_api_version.major_version = PJRT_API_MAJOR;
  api.pjrt_api_version.minor_version = PJRT_API_MINOR;
  api.PJRT_Error_Destroy = ErrorDestroy;
  api.PJRT_Error_Message = ErrorMessage;
  api.PJRT_Error_GetCode = ErrorGetCode;
  api.PJRT_Plugin_Initialize = PluginInitialize;
  api.PJRT_Event_Await = EventAwait;
  api.PJRT_Event_Destroy = EventDestroy;
  api.PJRT_Client_Create = ClientCreate;
  api.PJRT_Client_Destroy = ClientDestroy;
  api.PJRT_Client_PlatformName = ClientPlatformName;
  api.PJRT_Client_AddressableDevices = ClientAddressableDevices;
  api.PJRT_Client_Compile = ClientCompile;
  api.PJRT_LoadedExecutable_GetExecutable = LoadedGetExecutable;
  api.PJRT_Executable_NumOutputs = ExecutableNumOutputs;
  api.PJRT_Executable_Destroy = ExecutableDestroy;
  api.PJRT_LoadedExecutable_Destroy = LoadedDestroy;
  api.PJRT_LoadedExecutable_Execute = LoadedExecute;
  api.PJRT_Client_BufferFromHostBuffer = BufferFromHost;
  api.PJRT_Buffer_Destroy = BufferDestroy;
  api.PJRT_Buffer_ElementType = BufferElementType;
  api.PJRT_Buffer_Dimensions = BufferDimensions;
  api.PJRT_Buffer_ToHostBuffer = BufferToHost;
  return api;
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api = make_api();
  return &api;
}
