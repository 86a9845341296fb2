// Stand-in for the cmake-generated defines.hpp (release build, GNU).
#pragma once
#define HEXL_USE_GNU
#define HEXL_UNUSED(x) (void)(x)
