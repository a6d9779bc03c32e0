// Minimal runtime-loaded module exercising the WRAP/Error machinery — the
// poc/go hello module's role (poc/go/poc.cu, poc/go/poc.go): one happy-path
// entry and one that returns a populated sppark_Error.

#include <cstdint>

#include "sppark_ffi.h"

extern "C" int sppark_poc_add(int a, int b) { return a + b; }
SPPARK_WRAP(sppark_poc_add)

extern "C" sppark_Error sppark_poc_fill(uint64_t *dst, size_t n)
{
    if (!dst) return sppark_err(22, "null destination");
    for (size_t i = 0; i < n; i++) dst[i] = i * i;
    return sppark_ok();
}
SPPARK_WRAP(sppark_poc_fill)

extern "C" sppark_Error sppark_poc_fail(void)
{
    return sppark_err(7, "deliberate failure");
}
SPPARK_WRAP(sppark_poc_fail)
