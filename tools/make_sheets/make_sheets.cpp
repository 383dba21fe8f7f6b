// make_sheets: particle -> projected-sheet gridder for BAHAMAS-style
// simulation dumps. Native (C++/OpenMP) replacement for the reference's
// Fortran tool (code/make_grid/BAHAMAS_sheets.f90), same CLI contract:
//
//   make_sheets <inbase> <Omega_m> <h> <L[Mpc/h]> <mesh> <outbase>
//               <n_sheet> <NGP|CIC>
//
// Inputs (if present): <inbase>_dm.dat, _dm2.dat, _gas.dat, _stars.dat in
// McCarthy stream-binary format:
//   int32 n; float32 mass[n] (1e10 Msun); float32 pos[n][3] (Mpc/h)
//   gas adds: float32 electron_pressure[n] (erg/cm^3, physical);
//             float32 n_H[n] (cm^-3)
// Outputs: <outbase>_{dm,gas,pressure,stars}_sheets - float32 stream
// binaries of shape (3 projections, n_sheet, mesh, mesh) in Fortran order
// (projection index fastest), byte-identical layout to the reference so
// downstream stack builders read either tool's output.
//
// Physics (constants.f90; BAHAMAS_sheets.f90:291-439):
//   kT [eV] = (Xe+Xi)/Xe * (ep/n_H) * mu * Y_H / eV_erg
//   particles with n_H > 0.1 cm^-3 are excluded (not ionised)
//   comoving electron pressure [eV/cm^3] =
//     kT * (mass/mu) * Xe/(Xe+Xi) / V_cell[Mpc^3] * Msun/m_p / (Mpc/cm)^3
//   density fields are normalised by the mean cell mass
//   rho_crit * Omega_m * L^3 / mesh^3.
//
// Deposition: NGP or CIC onto each of the three axis projections, with the
// sheet index along the projected axis. NOTE: the reference's CIC_sheets
// swaps the dx/dy weights on the mixed neighbour terms of projections 2 and
// 3 (BAHAMAS_sheets.f90:738-753); this implementation assigns each
// neighbour offset its own axis weight for all three projections (verified
// against a numpy oracle in tests/test_make_sheets.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Physical constants (constants.f90 equivalents)
constexpr double kCriticalDensity = 2.775e11;  // (Msun/h)/(Mpc/h)^3
constexpr double kMsun = 1.989e30;             // kg
constexpr double kMp = 1.6726e-27;             // kg
constexpr double kMpcOverCm = 3.086e22 / 0.01; // cm per Mpc
constexpr double kEvErg = 1.60218e-19 * 1e7;   // eV in erg
constexpr double kFH = 0.752;                  // hydrogen mass fraction
constexpr double kMu = 0.61;                   // mean molecular weight
constexpr double kXe = 1.17;                   // n_e / n_H
constexpr double kXi = 1.08;                   // n_i / n_H
constexpr double kMassFac = 1e10;              // file mass unit -> Msun
constexpr float kNhCut = 0.1f;                 // ionisation cut [cm^-3]

struct Particles {
  std::vector<float> pos;   // (n, 3) interleaved
  std::vector<float> mass;  // Msun
  std::vector<float> ep;    // electron pressure (gas only)
  std::vector<float> nh;    // hydrogen number density (gas only)
  int64_t n = 0;
};

bool file_exists(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (f) std::fclose(f);
  return f != nullptr;
}

void read_block(FILE* f, float* dst, int64_t count, const char* what) {
  if (std::fread(dst, sizeof(float), count, f) != size_t(count)) {
    std::fprintf(stderr, "make_sheets: short read of %s\n", what);
    std::exit(1);
  }
}

Particles read_mccarthy(const std::string& path, bool gas) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "make_sheets: cannot open %s\n", path.c_str());
    std::exit(1);
  }
  int32_t n32 = 0;
  if (std::fread(&n32, sizeof(n32), 1, f) != 1) {
    std::fprintf(stderr, "make_sheets: cannot read count from %s\n",
                 path.c_str());
    std::exit(1);
  }
  Particles p;
  p.n = (n32 == 1) ? 0 : n32;  // n==1 marks an empty file upstream
  if (p.n == 0) {
    std::fclose(f);
    return p;
  }
  p.mass.resize(p.n);
  p.pos.resize(3 * p.n);
  read_block(f, p.mass.data(), p.n, "masses");
  read_block(f, p.pos.data(), 3 * p.n, "positions");
  if (gas) {
    p.ep.resize(p.n);
    p.nh.resize(p.n);
    read_block(f, p.ep.data(), p.n, "electron pressure");
    read_block(f, p.nh.data(), p.n, "hydrogen density");
  }
  std::fclose(f);
  for (int64_t i = 0; i < p.n; ++i) p.mass[i] *= kMassFac;
  std::printf("make_sheets: read %lld particles from %s\n",
              static_cast<long long>(p.n), path.c_str());
  return p;
}

// Enforce periodicity: all coordinates into [0, L).
void wrap_positions(Particles& p, float L) {
  for (int64_t i = 0; i < 3 * p.n; ++i) {
    float x = p.pos[i];
    if (x >= L) x -= L;
    if (x < 0.f) x += L;
    p.pos[i] = x;
  }
}

// Gas internal energy kT [eV] from physical electron pressure and n_H.
std::vector<float> compute_kT(const Particles& p) {
  std::vector<float> kT(p.n);
  const double fac = (kXe + kXi) / kXe * kMu * kFH / kEvErg;
  for (int64_t i = 0; i < p.n; ++i) {
    kT[i] = static_cast<float>(fac * p.ep[i] / p.nh[i]);
  }
  return kT;
}

// kT [eV] -> comoving electron pressure contribution [eV/cm^3].
void convert_to_comoving_pressure(std::vector<float>& kT,
                                  const Particles& p, double L, double h,
                                  int mesh) {
  const double v_cell = std::pow(L / mesh, 3) / (h * h * h);  // Mpc^3
  const double units = kMsun / kMp / std::pow(kMpcOverCm, 3);
  for (int64_t i = 0; i < p.n; ++i) {
    if (p.nh[i] > kNhCut) {
      kT[i] = 0.f;  // dense gas is not ionised
      continue;
    }
    double v = double(kT[i]) * (p.mass[i] / kMu) * kXe / (kXe + kXi);
    kT[i] = static_cast<float>(v / v_cell * units);
  }
}

// Field layout identical to the Fortran d(3, n_sheet, m, m):
// flat = proj + 3*(sheet + n_sheet*(row + m*col))
struct SheetField {
  std::vector<double> acc;  // accumulate in double, emit float32
  int n_sheet, m;
  SheetField(int n_sheet_, int m_)
      : acc(size_t(3) * n_sheet_ * m_ * m_, 0.0), n_sheet(n_sheet_), m(m_) {}
  inline size_t at(int proj, int sheet, int row, int col) const {
    return size_t(proj) +
           3 * (size_t(sheet) + size_t(n_sheet) * (size_t(row) + size_t(m) * col));
  }
  void add(int proj, int sheet, int row, int col, double w) {
    acc[at(proj, sheet, row, col)] += w;
  }
};

inline int cell_of(float x, float L, int m) {
  if (x == 0.f) return 0;
  int c = int(std::ceil(double(x) * m / L)) - 1;
  if (c < 0) c = 0;
  if (c >= m) c = m - 1;
  return c;
}

inline int sheet_of(int cell, int m, int n_sheet) {
  // Fortran: CEILING(real(cell_1based)/m*n_sheet), converted to 0-based
  return int(std::ceil(double(cell + 1) / m * n_sheet)) - 1;
}

// OpenMP-threaded particle loop (SURVEY §7.8; the reference Fortran hot loop
// BAHAMAS_sheets.f90:487-764 is serial). Each thread deposits into a private
// accumulator over a static chunk of particles; partials are then reduced in
// thread order, so the result is deterministic for a given thread count and
// equal to the serial sum up to double-add reassociation (invisible at the
// emitted float32 precision - tested byte-for-byte in test_make_sheets.py).
// Thread count is capped so the private fields stay under ~4 GiB total.
template <typename PerParticle>
void run_deposit(int64_t n, SheetField& d, const PerParticle& body) {
#ifdef _OPENMP
  const size_t bytes = d.acc.size() * sizeof(double);
  int nt = omp_get_max_threads();
  if (bytes > 0) {
    const size_t budget = size_t(4) << 30;
    const size_t cap = budget / bytes;
    if (cap < size_t(nt)) nt = int(cap ? cap : 1);
  }
  if (nt > 1 && n > 1) {
    std::vector<std::vector<double>> partials(nt);
    #pragma omp parallel num_threads(nt)
    {
      const int t = omp_get_thread_num();
      std::vector<double>& acc = partials[t];
      acc.assign(d.acc.size(), 0.0);
      SheetField local(d.n_sheet, d.m);
      local.acc.swap(acc);
      #pragma omp for schedule(static)
      for (int64_t i = 0; i < n; ++i) body(i, local);
      local.acc.swap(acc);
    }
    for (int t = 0; t < nt; ++t)
      for (size_t j = 0; j < d.acc.size(); ++j) d.acc[j] += partials[t][j];
    return;
  }
#endif
  for (int64_t i = 0; i < n; ++i) body(i, d);
}

void deposit_ngp(const Particles& p, const std::vector<float>& w, float L,
                 SheetField& d) {
  const int m = d.m, ns = d.n_sheet;
  run_deposit(p.n, d, [&](int64_t i, SheetField& out) {
    const int ix = cell_of(p.pos[3 * i], L, m);
    const int iy = cell_of(p.pos[3 * i + 1], L, m);
    const int iz = cell_of(p.pos[3 * i + 2], L, m);
    const double wi = w[i];
    out.add(0, sheet_of(ix, m, ns), iy, iz, wi);
    out.add(1, sheet_of(iy, m, ns), ix, iz, wi);
    out.add(2, sheet_of(iz, m, ns), ix, iy, wi);
  });
}

void deposit_cic(const Particles& p, const std::vector<float>& w, float L,
                 SheetField& d) {
  const int m = d.m, ns = d.n_sheet;
  run_deposit(p.n, d, [&](int64_t i, SheetField& out) {
    int ic[3], in[3];
    double frac[3];
    for (int a = 0; a < 3; ++a) {
      const float x = p.pos[3 * i + a];
      const int c = cell_of(x, L, m);
      double dx = double(x) / L * m - (c + 0.5);
      int nb;
      if (dx >= 0) {
        nb = (c + 1) % m;  // periodic neighbour
      } else {
        nb = (c - 1 + m) % m;
        dx = -dx;
      }
      ic[a] = c;
      in[a] = nb;
      frac[a] = dx;
    }
    const double wi = w[i];
    // 8 corners: bit b of corner selects cell (0) or neighbour (1) per axis
    for (int corner = 0; corner < 8; ++corner) {
      double cw = wi;
      int idx[3];
      for (int a = 0; a < 3; ++a) {
        const bool nb = corner & (1 << a);
        cw *= nb ? frac[a] : (1.0 - frac[a]);
        idx[a] = nb ? in[a] : ic[a];
      }
      if (cw == 0.0) continue;
      out.add(0, sheet_of(idx[0], m, ns), idx[1], idx[2], cw);
      out.add(1, sheet_of(idx[1], m, ns), idx[0], idx[2], cw);
      out.add(2, sheet_of(idx[2], m, ns), idx[0], idx[1], cw);
    }
  });
}

void write_field(const SheetField& d, const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) {
    std::fprintf(stderr, "make_sheets: cannot write %s\n", path.c_str());
    std::exit(1);
  }
  std::vector<float> out(d.acc.size());
  for (size_t i = 0; i < d.acc.size(); ++i) out[i] = float(d.acc[i]);
  std::fwrite(out.data(), sizeof(float), out.size(), f);
  std::fclose(f);
  std::printf("make_sheets: wrote %s (%zu values)\n", path.c_str(),
              out.size());
}

void scale_field(SheetField& d, double factor) {
  for (double& v : d.acc) v *= factor;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 9) {
    std::fprintf(stderr,
                 "usage: make_sheets <inbase> <Omega_m> <h> <L> <mesh> "
                 "<outbase> <n_sheet> <NGP|CIC>\n");
    return 1;
  }
  const std::string inbase = argv[1];
  const double om_m = std::atof(argv[2]);
  const double h = std::atof(argv[3]);
  const double L = std::atof(argv[4]);
  const int mesh = std::atoi(argv[5]);
  const std::string outbase = argv[6];
  const int n_sheet = std::atoi(argv[7]);
  const bool cic = std::strcmp(argv[8], "CIC") == 0;
  if (!cic && std::strcmp(argv[8], "NGP") != 0) {
    std::fprintf(stderr, "make_sheets: binning must be NGP or CIC\n");
    return 1;
  }

  const double total_box_mass = kCriticalDensity * om_m * L * L * L;
  const double avg_cell_mass = total_box_mass / (double(mesh) * mesh * mesh);
  std::printf("make_sheets: L=%g Mpc/h mesh=%d sheets=%d %s\n", L, mesh,
              n_sheet, cic ? "CIC" : "NGP");
  std::printf("make_sheets: mean cell mass %.6e Msun/h\n", avg_cell_mass);

  auto deposit = [&](const Particles& p, const std::vector<float>& w,
                     SheetField& d) {
    if (cic)
      deposit_cic(p, w, float(L), d);
    else
      deposit_ngp(p, w, float(L), d);
  };

  auto process_density = [&](const std::string& suffix_in,
                             const std::string& suffix_out) {
    const std::string path = inbase + "_" + suffix_in + ".dat";
    if (!file_exists(path)) return false;
    Particles p = read_mccarthy(path, false);
    wrap_positions(p, float(L));
    SheetField d(n_sheet, mesh);
    deposit(p, p.mass, d);
    scale_field(d, 1.0 / avg_cell_mass);
    write_field(d, outbase + "_" + suffix_out + "_sheets");
    return true;
  };

  if (!process_density("dm", "dm")) {
    std::fprintf(stderr, "make_sheets: %s_dm.dat is required\n",
                 inbase.c_str());
    return 1;
  }
  process_density("dm2", "gas");  // dual-fluid runs label dm2 as gas
  process_density("stars", "stars");

  const std::string gas_path = inbase + "_gas.dat";
  if (file_exists(gas_path)) {
    Particles p = read_mccarthy(gas_path, true);
    wrap_positions(p, float(L));
    {
      SheetField d(n_sheet, mesh);
      deposit(p, p.mass, d);
      scale_field(d, 1.0 / avg_cell_mass);
      write_field(d, outbase + "_gas_sheets");
    }
    std::vector<float> kT = compute_kT(p);
    convert_to_comoving_pressure(kT, p, L, h, mesh);
    SheetField d(n_sheet, mesh);
    deposit(p, kT, d);
    write_field(d, outbase + "_pressure_sheets");
  }
  return 0;
}
