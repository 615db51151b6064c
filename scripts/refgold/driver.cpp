// Standalone golden-reference driver.
//
// Compiles the UNMODIFIED reference C++ core (/root/reference/Source,
// Goobley/Lightweaver) into a command-line program that runs a 1D MALI
// statistical-equilibrium problem from exported arrays, with no Cython/Python
// dependency. It replicates the wiring the reference's Cython middle layer
// performs (LwMiddleLayer.pyx:580-3520) so that the genuine reference kernels
// (compute_phi, basic_background, formal_sol_gamma_matrices, stat_eq) produce
// golden artifacts for lightweaver_tpu's regression tests.
//
// This file is original code written for the lightweaver_tpu project; only
// the *headers* of the reference are included, and the reference core is
// linked unmodified. Nothing here ships in the framework package.
//
// Usage: refgold_driver <input_dir> <output_dir>
//   input_dir must contain manifest.txt + .npy arrays (see export_inputs.py).

#include "Lightweaver.hpp"
#include "Background.hpp"
#include "LwInternal.hpp"
#include "npyio.hpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

using npyio::NpyArray;

struct TransHolder
{
    Transition trans;
    NpyArray wavelength;   // local grid [Nlt]
    NpyArray aDamp;        // lines
    NpyArray alpha;        // continua
    NpyArray activeMask;   // i8 [Nspect]
    NpyArray qelast;       // PRD lines: elastic collision rate [Nspace]
    std::vector<double> phi;   // [Nlt, Nrays, 2, Nspace]
    std::vector<double> wphi;  // [Nspace]
    std::vector<double> Qelast;
    std::vector<double> Rij, Rji;
    std::vector<double> rhoPrd;  // PRD lines [Nlt, Nspace]
};

struct AtomHolder
{
    Atom atom;
    NpyArray n, nStar, nTotal, vBroad, stages, C0;
    std::vector<double> Gamma, C;
    std::vector<TransHolder*> trans;
};

static RadiationBc parse_bc(const std::string& s)
{
    if (s == "ZERO")
        return RadiationBc::ZERO;
    if (s == "THERMALISED")
        return RadiationBc::THERMALISED;
    if (s == "PERIODIC")
        return RadiationBc::PERIODIC;
    if (s == "CALLABLE")
        return RadiationBc::CALLABLE;
    std::fprintf(stderr, "Unknown BC %s\n", s.c_str());
    std::exit(1);
}

int main(int argc, char** argv)
{
    if (argc != 3)
    {
        std::fprintf(stderr, "usage: %s <input_dir> <output_dir>\n", argv[0]);
        return 1;
    }
    std::string in = argv[1];
    std::string out = argv[2];
    auto ipath = [&](const std::string& name) { return in + "/" + name; };
    auto opath = [&](const std::string& name) { return out + "/" + name; };

    // ---- Manifest ----------------------------------------------------------
    std::ifstream mf(ipath("manifest.txt"));
    if (!mf)
    {
        std::fprintf(stderr, "cannot open manifest\n");
        return 1;
    }
    int Nspace = 0, Nrays = 0, Nspect = 0, Ndim = 1, Nx2d = 0;
    int Nscatter = 3, maxIter = 500, Natoms = 0;
    int prdSubIter = 3;
    int stokesMode = 0;
    int ngOrder = 0, ngPeriod = 0, ngDelay = 0;
    int hprdMode = 0;
    int conserveMode = 0;
    int tdSteps = 0, tdSubIter = 2;
    double tdDt = 0.0;
    double JTol = 5e-3, popsTol = 1e-3, prdTol = 1e-2;
    std::string zLower = "THERMALISED", zUpper = "ZERO";
    std::string xLower = "PERIODIC", xUpper = "PERIODIC";
    std::string solverName = "piecewise_bezier3_1d";
    std::string interpName = "interp_linear_2d";
    struct TransSpec
    {
        std::string type;
        int i, j, Nblue, Nred;
        double Aji, Bji, Bij, lambda0;
        bool prd = false;
    };
    struct AtomSpec
    {
        int Nlevel;
        std::vector<TransSpec> trans;
    };
    std::vector<AtomSpec> atomSpecs;

    std::string key;
    while (mf >> key)
    {
        if (key == "Nspace") mf >> Nspace;
        else if (key == "Nrays") mf >> Nrays;
        else if (key == "Nspect") mf >> Nspect;
        else if (key == "Ndim") mf >> Ndim;
        else if (key == "Nscatter") mf >> Nscatter;
        else if (key == "maxIter") mf >> maxIter;
        else if (key == "JTol") mf >> JTol;
        else if (key == "popsTol") mf >> popsTol;
        else if (key == "prdSubIter") mf >> prdSubIter;
        else if (key == "prdTol") mf >> prdTol;
        else if (key == "stokes") mf >> stokesMode;
        else if (key == "ng") mf >> ngOrder >> ngPeriod >> ngDelay;
        else if (key == "hprd") mf >> hprdMode;
        else if (key == "conserve") mf >> conserveMode;
        else if (key == "timedep") mf >> tdDt >> tdSteps >> tdSubIter;
        else if (key == "zLowerBc") mf >> zLower;
        else if (key == "zUpperBc") mf >> zUpper;
        else if (key == "xLowerBc") mf >> xLower;
        else if (key == "xUpperBc") mf >> xUpper;
        else if (key == "Nx") mf >> Nx2d;
        else if (key == "formalSolver") mf >> solverName;
        else if (key == "interpFn") mf >> interpName;
        else if (key == "Natoms") mf >> Natoms;
        else if (key == "atom")
        {
            AtomSpec a;
            int Ntrans;
            mf >> a.Nlevel >> Ntrans;
            a.trans.resize(Ntrans);
            atomSpecs.push_back(a);
        }
        else if (key == "trans")
        {
            auto& a = atomSpecs.back();
            TransSpec t;
            mf >> t.type >> t.i >> t.j >> t.Aji >> t.Bji >> t.Bij >> t.lambda0
               >> t.Nblue >> t.Nred;
            // optional trailing flags on the same line (e.g. "prd")
            std::string rest;
            std::getline(mf, rest);
            t.prd = rest.find("prd") != std::string::npos;
            for (auto& slot : a.trans)
            {
                if (slot.type.empty())
                {
                    slot = t;
                    break;
                }
            }
        }
        else
        {
            std::string skip;
            std::getline(mf, skip);
        }
    }

    // ---- Atmosphere --------------------------------------------------------
    // (magnetic field arrays loaded below when stokes mode is on)
    NpyArray z = npyio::load(ipath("z.npy"));
    NpyArray temperature = npyio::load(ipath("temperature.npy"));
    NpyArray ne = npyio::load(ipath("ne.npy"));
    NpyArray vz = npyio::load(ipath("vz.npy"));
    NpyArray vturb = npyio::load(ipath("vturb.npy"));
    NpyArray nHTot = npyio::load(ipath("nHTot.npy"));
    NpyArray muz = npyio::load(ipath("muz.npy"));
    NpyArray mux = npyio::load(ipath("mux.npy"));
    NpyArray muy = npyio::load(ipath("muy.npy"));
    NpyArray wmu = npyio::load(ipath("wmu.npy"));
    std::vector<double> vlosMu((size_t)Nrays * Nspace, 0.0);
    std::vector<double> vxDummy(Nspace, 0.0), vyDummy(Nspace, 0.0);

    Atmosphere atmos;
    atmos.Nspace = Nspace;
    atmos.Nrays = Nrays;
    atmos.Ndim = Ndim;
    atmos.Nx = 0;
    atmos.Ny = 0;
    atmos.Nz = Nspace;
    atmos.Noutgoing = 1;
    NpyArray x2d, vx2d;
    if (Ndim == 2)
    {
        // flat k = z*Nx + x layout, like LwMiddleLayer.pyx:620-714
        atmos.Nx = Nx2d;
        atmos.Nz = Nspace / Nx2d;
        atmos.Noutgoing = Nx2d;
        x2d = npyio::load(ipath("x.npy"));
        atmos.x = F64View(x2d.f64.data(), Nx2d);
        vx2d = npyio::load(ipath("vx.npy"));
    }
    atmos.z = F64View(z.f64.data(), atmos.Nz);
    atmos.height = F64View(z.f64.data(), atmos.Nz);
    atmos.temperature = F64View(temperature.f64.data(), Nspace);
    atmos.ne = F64View(ne.f64.data(), Nspace);
    atmos.vx = (Ndim == 2) ? F64View(vx2d.f64.data(), Nspace)
                           : F64View(vxDummy.data(), Nspace);
    atmos.vy = F64View(vyDummy.data(), Nspace);
    atmos.vz = F64View(vz.f64.data(), Nspace);
    atmos.vturb = F64View(vturb.f64.data(), Nspace);
    atmos.nHTot = F64View(nHTot.f64.data(), Nspace);
    atmos.muz = F64View(muz.f64.data(), Nrays);
    atmos.muy = F64View(muy.f64.data(), Nrays);
    atmos.mux = F64View(mux.f64.data(), Nrays);
    atmos.wmu = F64View(wmu.f64.data(), Nrays);
    atmos.vlosMu = F64View2D(vlosMu.data(), Nrays, Nspace);

    std::vector<int32_t> bcIdxDummy(Nrays * 2, -1);
    BcIdxs bcIdxs(bcIdxDummy.data(), Nrays, 2);
    atmos.zLowerBc = AtmosphericBoundaryCondition(parse_bc(zLower), Nspect, Nrays, 1, bcIdxs);
    atmos.zUpperBc = AtmosphericBoundaryCondition(parse_bc(zUpper), Nspect, Nrays, 1, bcIdxs);
    atmos.xLowerBc = AtmosphericBoundaryCondition();
    atmos.xUpperBc = AtmosphericBoundaryCondition();
    atmos.yLowerBc = AtmosphericBoundaryCondition();
    atmos.yUpperBc = AtmosphericBoundaryCondition();
    std::vector<int32_t> xBcIdxBuf;
    NpyArray xLowerData, xUpperData;
    if (Ndim == 2)
    {
        // trivial (mu, toObs) -> bcData row mapping: muIdx = 2*mu + toObs
        // (the Cython layer derives an equivalent indexVector from the
        // atmosphere's structure; any consistent mapping works since we
        // export the data rows in the same order)
        xBcIdxBuf.resize((size_t)Nrays * 2);
        for (int mu = 0; mu < Nrays; ++mu)
            for (int t = 0; t < 2; ++t)
                xBcIdxBuf[mu * 2 + t] = 2 * mu + t;
        BcIdxs xIdxs(xBcIdxBuf.data(), Nrays, 2);
        atmos.xLowerBc = AtmosphericBoundaryCondition(
            parse_bc(xLower), Nspect, 2 * Nrays, atmos.Nz, xIdxs);
        atmos.xUpperBc = AtmosphericBoundaryCondition(
            parse_bc(xUpper), Nspect, 2 * Nrays, atmos.Nz, xIdxs);
        if (atmos.xLowerBc.type == RadiationBc::CALLABLE)
        {
            xLowerData = npyio::load(ipath("xlowerbc_data.npy"));
            atmos.xLowerBc.set_bc_data(
                F64View3D(xLowerData.f64.data(), Nspect, 2 * Nrays,
                          atmos.Nz));
            xUpperData = npyio::load(ipath("xupperbc_data.npy"));
            atmos.xUpperBc.set_bc_data(
                F64View3D(xUpperData.f64.data(), Nspect, 2 * Nrays,
                          atmos.Nz));
        }
    }

    NpyArray Bmag, gammaB, chiB;
    std::vector<double> cosGammaBuf, cos2chiBuf, sin2chiBuf;
    if (stokesMode)
    {
        // magnetic field + per-ray projections for the full-Stokes
        // synthesis (ref: Atmosphere.cpp:47-83, LwMiddleLayer.pyx:700-710)
        Bmag = npyio::load(ipath("B.npy"));
        gammaB = npyio::load(ipath("gammaB.npy"));
        chiB = npyio::load(ipath("chiB.npy"));
        atmos.B = F64View(Bmag.f64.data(), Nspace);
        atmos.gammaB = F64View(gammaB.f64.data(), Nspace);
        atmos.chiB = F64View(chiB.f64.data(), Nspace);
        cosGammaBuf.assign((size_t)Nrays * Nspace, 0.0);
        cos2chiBuf.assign((size_t)Nrays * Nspace, 0.0);
        sin2chiBuf.assign((size_t)Nrays * Nspace, 0.0);
        atmos.cosGamma = F64View2D(cosGammaBuf.data(), Nrays, Nspace);
        atmos.cos2chi = F64View2D(cos2chiBuf.data(), Nrays, Nspace);
        atmos.sin2chi = F64View2D(sin2chiBuf.data(), Nrays, Nspace);
    }

    atmos.update_projections();
    build_intersection_list(&atmos);

    // ---- Spectrum ----------------------------------------------------------
    NpyArray wavelength = npyio::load(ipath("wavelength.npy"));
    const int Noutgoing = atmos.Noutgoing;
    std::vector<double> Ibuf((size_t)Nspect * Nrays * Noutgoing, 0.0);
    std::vector<double> Jbuf((size_t)Nspect * Nspace, 0.0);
    Spectrum spect;
    spect.wavelength = F64View(wavelength.f64.data(), Nspect);
    spect.I = F64View3D(Ibuf.data(), Nspect, Nrays, Noutgoing);
    spect.J = F64View2D(Jbuf.data(), Nspect, Nspace);

    // ---- Background (precomputed arrays fed to the iteration) --------------
    NpyArray bgChi = npyio::load(ipath("bg_chi.npy"));
    NpyArray bgEta = npyio::load(ipath("bg_eta.npy"));
    NpyArray bgSca = npyio::load(ipath("bg_sca.npy"));
    Background background;
    background.chi = F64View2D(bgChi.f64.data(), Nspect, Nspace);
    background.eta = F64View2D(bgEta.f64.data(), Nspect, Nspace);
    background.sca = F64View2D(bgSca.f64.data(), Nspect, Nspace);

    // ---- Atoms and transitions ---------------------------------------------
    std::vector<std::unique_ptr<AtomHolder>> atoms;
    std::vector<std::unique_ptr<TransHolder>> transStore;

    for (int ia = 0; ia < Natoms; ++ia)
    {
        auto holder = std::make_unique<AtomHolder>();
        auto& spec = atomSpecs[ia];
        std::string pre = "atom" + std::to_string(ia) + "_";
        holder->n = npyio::load(ipath(pre + "n0.npy"));
        holder->nStar = npyio::load(ipath(pre + "nstar.npy"));
        holder->nTotal = npyio::load(ipath(pre + "ntotal.npy"));
        holder->vBroad = npyio::load(ipath(pre + "vbroad.npy"));
        holder->stages = npyio::load(ipath(pre + "stages.npy"));
        holder->C0 = npyio::load(ipath(pre + "C.npy"));

        Atom& a = holder->atom;
        a.Nlevel = spec.Nlevel;
        a.Ntrans = (int)spec.trans.size();
        a.atmos = &atmos;
        a.n = F64View2D(holder->n.f64.data(), spec.Nlevel, Nspace);
        a.nStar = F64View2D(holder->nStar.f64.data(), spec.Nlevel, Nspace);
        a.nTotal = F64View(holder->nTotal.f64.data(), Nspace);
        a.vBroad = F64View(holder->vBroad.f64.data(), Nspace);
        a.stages = F64View(holder->stages.f64.data(), spec.Nlevel);
        holder->Gamma.assign((size_t)spec.Nlevel * spec.Nlevel * Nspace, 0.0);
        holder->C.assign(holder->C0.f64.begin(), holder->C0.f64.end());
        a.Gamma = F64View3D(holder->Gamma.data(), spec.Nlevel, spec.Nlevel, Nspace);
        a.C = F64View3D(holder->C.data(), spec.Nlevel, spec.Nlevel, Nspace);
        a.methodScratch = nullptr;

        for (int it = 0; it < (int)spec.trans.size(); ++it)
        {
            auto th = std::make_unique<TransHolder>();
            auto& ts = spec.trans[it];
            std::string tpre = pre + "trans" + std::to_string(it) + "_";
            th->wavelength = npyio::load(ipath(tpre + "wavelength.npy"));
            th->activeMask = npyio::load(ipath(tpre + "active.npy"));
            int Nlt = (int)th->wavelength.shape[0];

            Transition& t = th->trans;
            t.i = ts.i;
            t.j = ts.j;
            t.Nblue = ts.Nblue;
            t.Nred = ts.Nred;
            t.lambda0 = ts.lambda0;
            t.polarised = false;
            t.wavelength = F64View(th->wavelength.f64.data(), Nlt);
            t.active = BoolView((bool*)th->activeMask.i8.data(), Nspect);
            th->Rij.assign(Nspace, 0.0);
            th->Rji.assign(Nspace, 0.0);
            t.Rij = F64View(th->Rij.data(), Nspace);
            t.Rji = F64View(th->Rji.data(), Nspace);
            t.methodScratch = nullptr;

            if (ts.type == "LINE")
            {
                t.type = TransitionType::LINE;
                t.Aji = ts.Aji;
                t.Bji = ts.Bji;
                t.Bij = ts.Bij;
                t.dopplerWidth = Constants::CLight / t.lambda0;
                th->aDamp = npyio::load(ipath(tpre + "adamp.npy"));
                th->Qelast.assign(Nspace, 0.0);
                t.aDamp = F64View(th->aDamp.f64.data(), Nspace);
                t.Qelast = F64View(th->Qelast.data(), Nspace);
                th->phi.assign((size_t)Nlt * Nrays * 2 * Nspace, 0.0);
                th->wphi.assign(Nspace, 0.0);
                t.phi = F64View4D(th->phi.data(), Nlt, Nrays, 2, Nspace);
                t.wphi = F64View(th->wphi.data(), Nspace);
                if (ts.prd)
                {
                    // PRD line: elastic rate + emission-profile ratio rho
                    // (ref PRD loop: PrdTemplates.hpp:176-330)
                    th->qelast = npyio::load(ipath(tpre + "qelast.npy"));
                    std::copy(th->qelast.f64.begin(), th->qelast.f64.end(),
                              th->Qelast.begin());
                    th->rhoPrd.assign((size_t)Nlt * Nspace, 1.0);
                    t.rhoPrd = F64View2D(th->rhoPrd.data(), Nlt, Nspace);
                }
            }
            else
            {
                t.type = TransitionType::CONTINUUM;
                t.dopplerWidth = 1.0;
                th->alpha = npyio::load(ipath(tpre + "alpha.npy"));
                t.alpha = F64View(th->alpha.f64.data(), Nlt);
            }

            a.trans.push_back(&t);
            holder->trans.push_back(th.get());
            transStore.push_back(std::move(th));
        }

        a.init_scratch(Nspace, false, true, true);
        // ngOrder>0 enables reference Ng acceleration (Ng.hpp:31-115),
        // wired exactly as the Cython layer does (LwMiddleLayer.pyx
        // atom.setup: ng initialised on the starting populations)
        a.ng = Ng(ngOrder, ngPeriod, ngDelay, a.n.flatten());
        atoms.push_back(std::move(holder));
    }

    // ---- Line profiles (reference Faddeeva) --------------------------------
    for (int ia = 0; ia < Natoms; ++ia)
    {
        auto& holder = atoms[ia];
        for (int it = 0; it < (int)holder->trans.size(); ++it)
        {
            Transition& t = holder->trans[it]->trans;
            if (t.type != TransitionType::LINE)
                continue;
            t.compute_phi(atmos, t.aDamp, holder->atom.vBroad);
            t.compute_wphi(atmos);
            std::string tag = "a" + std::to_string(ia) + "t" + std::to_string(it);
            npyio::save(opath("out_phi_" + tag + ".npy"), holder->trans[it]->phi.data(),
                        {t.wavelength.shape(0), Nrays, 2, Nspace});
            npyio::save(opath("out_wphi_" + tag + ".npy"), holder->trans[it]->wphi.data(),
                        {Nspace});
        }
    }

    // ---- basic_background golden (H-, H ff, H2, OH/CH, Thomson only) -------
    {
        NpyArray hPops = npyio::load(ipath("bgin_hpops.npy"));
        NpyArray hMinus = npyio::load(ipath("bgin_hminus.npy"));
        int NhLevel = (int)hPops.shape[0];
        std::vector<double> bchi((size_t)Nspect * Nspace, 0.0);
        std::vector<double> beta((size_t)Nspect * Nspace, 0.0);
        std::vector<double> bsca((size_t)Nspect * Nspace, 0.0);
        BackgroundData bd;
        bd.hPops = F64View2D(hPops.f64.data(), NhLevel, Nspace);
        bd.hMinusPops = F64View(hMinus.f64.data(), Nspace);
        NpyArray h2Pops, ohPops, chPops;
        try
        {
            h2Pops = npyio::load(ipath("bgin_h2.npy"));
            bd.h2Pops = F64View(h2Pops.f64.data(), Nspace);
        }
        catch (const std::exception&) {}
        try
        {
            ohPops = npyio::load(ipath("bgin_oh.npy"));
            bd.ohPops = F64View(ohPops.f64.data(), Nspace);
        }
        catch (const std::exception&) {}
        try
        {
            chPops = npyio::load(ipath("bgin_ch.npy"));
            bd.chPops = F64View(chPops.f64.data(), Nspace);
        }
        catch (const std::exception&) {}
        bd.wavelength = F64View(wavelength.f64.data(), Nspect);
        bd.chi = F64View2D(bchi.data(), Nspect, Nspace);
        bd.eta = F64View2D(beta.data(), Nspect, Nspace);
        bd.scatt = F64View2D(bsca.data(), Nspect, Nspace);
        basic_background(&bd, &atmos);
        npyio::save(opath("out_bb_chi.npy"), bchi.data(), {Nspect, Nspace});
        npyio::save(opath("out_bb_eta.npy"), beta.data(), {Nspect, Nspace});
        npyio::save(opath("out_bb_sca.npy"), bsca.data(), {Nspect, Nspace});
    }

    // ---- Context -----------------------------------------------------------
    DepthData depthData;
    depthData.fill = false;

    Context ctx;
    ctx.atmos = &atmos;
    ctx.spect = &spect;
    ctx.background = &background;
    ctx.depthData = &depthData;
    ctx.Nthreads = 1;
    if (const char* nt = std::getenv("REFGOLD_NTHREADS"))
        ctx.Nthreads = std::max(1, std::atoi(nt));
    ctx.methodScratch = nullptr;
    for (auto& holder : atoms)
        ctx.activeAtoms.push_back(&holder->atom);

    FormalSolverManager fsManager;
    bool fsFound = false;
    for (auto& fs : fsManager.formalSolvers)
    {
        if (solverName == fs.name)
        {
            ctx.formalSolver = fs;
            fsFound = true;
        }
    }
    if (!fsFound)
    {
        std::fprintf(stderr, "unknown solver %s\n", solverName.c_str());
        return 1;
    }
    InterpFnManager interpManager;
    ctx.interpFn = interpManager.fns[0];
    for (auto& f : interpManager.fns)
        if (interpName == f.name)
            ctx.interpFn = f;
    FsIterationFnsManager iterManager;
    ctx.iterFns = iterManager.fns[0];

    if (hprdMode)
    {
        // hybrid PRD: build the JRest/JCoeffs machinery and the per-line
        // shifted-rho coefficients exactly as LwContext does when
        // hprd=True (Prd.cpp:697-945).  MUST run before
        // initialise_threads: the per-thread intensity cores capture
        // views of spect.JRest and each transition's hPrdCoeffs
        // (ThreadStorage.cpp:58,251) at thread-init time
        // (LwMiddleLayer.pyx:2957 configures in __init__, threads later).
        configure_hprd_coeffs(ctx, false);
    }

    ctx.initialise_threads();


    // ---- Benchmark mode: time formal_sol_gamma_matrices only ---------------
    if (const char* bi = std::getenv("REFGOLD_BENCH_ITERS"))
    {
        int nBench = std::max(1, std::atoi(bi));
        for (int it = 0; it < 2; ++it)   // warmup
            formal_sol_gamma_matrices(ctx, false);
        auto t0 = std::chrono::steady_clock::now();
        for (int it = 0; it < nBench; ++it)
            formal_sol_gamma_matrices(ctx, false);
        auto t1 = std::chrono::steady_clock::now();
        double msPerIter =
            std::chrono::duration<double, std::milli>(t1 - t0).count()
            / nBench;
        std::printf("refgold-bench: Nspace=%d Nspect=%d Nrays=%d "
                    "Nthreads=%d ms_per_iter=%.3f\n",
                    Nspace, Nspect, Nrays, ctx.Nthreads, msPerIter);
        npyio::save(opath("out_ms_per_iter.npy"), &msPerIter, {1});
        return 0;
    }

    // ---- Time-dependent mode (golden for time_dependent_update) ------------
    // Nscatter pure Lambda iterations from the LTE start, then tdSteps
    // backward-Euler steps of tdSubIter (FS + time_dependent_update)
    // sub-iterations each, exactly the sequence
    // tests/test_vs_reference_golden.py drives on the lightweaver_tpu
    // side (ref: UpdatePopulations.cpp:120-152, LwMiddleLayer.pyx
    // time_dep_update).
    if (tdSteps > 0)
    {
        for (int it = 0; it < Nscatter; ++it)
        {
            for (auto& holder : atoms)
                std::copy(holder->C.begin(), holder->C.end(),
                          holder->Gamma.begin());
            formal_sol_gamma_matrices(ctx, false);
        }
        std::vector<std::vector<double>> nOldStore(Natoms);
        for (int step = 0; step < tdSteps; ++step)
        {
            for (int ia = 0; ia < Natoms; ++ia)
            {
                auto& a = atoms[ia]->atom;
                nOldStore[ia].assign(a.n.data,
                                     a.n.data + a.Nlevel * Nspace);
            }
            for (int sub = 0; sub < tdSubIter; ++sub)
            {
                for (auto& holder : atoms)
                    std::copy(holder->C.begin(), holder->C.end(),
                              holder->Gamma.begin());
                formal_sol_gamma_matrices(ctx, false);
                for (int ia = 0; ia < Natoms; ++ia)
                {
                    auto& a = atoms[ia]->atom;
                    F64View2D nOld(nOldStore[ia].data(), a.Nlevel, Nspace);
                    time_dependent_update(ctx, &a, nOld, tdDt,
                                          ExtraParams{}, -1, -1);
                }
            }
            for (int ia = 0; ia < Natoms; ++ia)
            {
                auto& a = atoms[ia]->atom;
                npyio::save(opath("out_td_step" + std::to_string(step)
                                  + "_a" + std::to_string(ia) + ".npy"),
                            a.n.data, {a.Nlevel, Nspace});
            }
        }
        npyio::save(opath("out_J.npy"), Jbuf.data(), {Nspect, Nspace});
        std::printf("refgold-timedep: %d steps dt=%g done\n", tdSteps,
                    tdDt);
        return 0;
    }

    // ---- MALI loop (mirrors iterate_ctx_se, fixed collisional rates) -------
    std::vector<double> dJHist, dPopsHist;
    int itConverged = -1;
    for (int it = 0; it < maxIter; ++it)
    {
        for (auto& holder : atoms)
        {
            // Gamma <- crsw * C with crsw = 1 (LwMiddleLayer.pyx:3198-3203)
            std::copy(holder->C.begin(), holder->C.end(), holder->Gamma.begin());
        }
        if (std::getenv("REFGOLD_VERBOSE"))
            std::fprintf(stderr, "iter %d begin\n", it);
        IterationResult fsResult;
        if (it == 0 && Ndim == 2 && std::getenv("REFGOLD_DUMP_ZPLANE"))
        {
            // debug: capture the down-pass intensity at plane Nz-2 and the
            // up-pass at plane 1 via the ZPlaneDecomposition hook
            std::vector<double> zdown((size_t)Nspect * Nrays * atmos.Nx, 0.0);
            std::vector<double> zup((size_t)Nspect * Nrays * atmos.Nx, 0.0);
            ExtraParams zp;
            zp.insert("ZPlaneDecomposition", true);
            zp.insert("ZPlaneDown", F64View3D(zdown.data(), Nspect, Nrays, atmos.Nx));
            zp.insert("ZPlaneUp", F64View3D(zup.data(), Nspect, Nrays, atmos.Nx));
            fsResult = formal_sol_gamma_matrices(ctx, false, zp);
            npyio::save(opath("out_zplane_down.npy"), zdown.data(), {Nspect, Nrays, atmos.Nx});
            npyio::save(opath("out_zplane_up.npy"), zup.data(), {Nspect, Nrays, atmos.Nx});
        }
        else
            fsResult = formal_sol_gamma_matrices(ctx, false);
        dJHist.push_back(fsResult.dJMax);

        if (it == 0)
        {
            npyio::save(opath("out_J_iter1.npy"), Jbuf.data(), {Nspect, Nspace});
            if (Ndim == 2)
                npyio::save(opath("out_I_iter1.npy"), Ibuf.data(),
                            {Nspect, Nrays, Noutgoing});
            else
                npyio::save(opath("out_I_iter1.npy"), Ibuf.data(), {Nspect, Nrays});
            for (int ia = 0; ia < Natoms; ++ia)
            {
                int Nl = atoms[ia]->atom.Nlevel;
                npyio::save(opath("out_Gamma_iter1_a" + std::to_string(ia) + ".npy"),
                            atoms[ia]->Gamma.data(), {Nl, Nl, Nspace});
            }
        }

        if (it < Nscatter)
        {
            dPopsHist.push_back(1.0);
            continue;
        }

        double dPopsMax = 0.0;
        for (auto& holder : atoms)
        {
            if (std::getenv("REFGOLD_VERBOSE"))
                std::fprintf(stderr, "  stat_eq atom\n");
            stat_eq(ctx, &holder->atom);
            holder->atom.ng.accelerate(holder->atom.n.flatten());
            auto change = holder->atom.ng.max_change();
            dPopsMax = std::max(dPopsMax, change.dMax);
        }
        dPopsHist.push_back(dPopsMax);

        bool havePrd = false;
        for (auto& holder : atoms)
            for (auto* th : holder->trans)
                havePrd = havePrd || (bool)th->trans.rhoPrd;
        if (havePrd)
        {
            if (std::getenv("REFGOLD_VERBOSE"))
                std::fprintf(stderr, "  redistribute\n");
            redistribute_prd_lines(ctx, prdSubIter, prdTol);
        }

        if (fsResult.dJMax < JTol && dPopsMax < popsTol)
        {
            itConverged = it;
            break;
        }
    }

    // ---- Converged outputs --------------------------------------------------
    npyio::save(opath("out_J.npy"), Jbuf.data(), {Nspect, Nspace});
    if (Ndim == 2)
        npyio::save(opath("out_I.npy"), Ibuf.data(), {Nspect, Nrays, Noutgoing});
    else
        npyio::save(opath("out_I.npy"), Ibuf.data(), {Nspect, Nrays});
    for (int ia = 0; ia < Natoms; ++ia)
    {
        auto& holder = atoms[ia];
        int Nl = holder->atom.Nlevel;
        npyio::save(opath("out_pops_a" + std::to_string(ia) + ".npy"),
                    holder->n.f64.data(), {Nl, Nspace});
        for (int it = 0; it < (int)holder->trans.size(); ++it)
        {
            std::string tag = "a" + std::to_string(ia) + "t" + std::to_string(it);
            npyio::save(opath("out_Rij_" + tag + ".npy"), holder->trans[it]->Rij.data(), {Nspace});
            npyio::save(opath("out_Rji_" + tag + ".npy"), holder->trans[it]->Rji.data(), {Nspace});
            auto* th = holder->trans[it];
            if ((bool)th->trans.rhoPrd)
            {
                int Nlt = (int)th->wavelength.shape[0];
                npyio::save(opath("out_rho_" + tag + ".npy"),
                            th->rhoPrd.data(), {Nlt, Nspace});
            }
        }
    }
    // ---- One NR charge-conservation step on the converged state ------------
    // Golden for nr_post_update (UpdatePopulations.cpp:229-395): the
    // collision-rate derivatives dC/dne and the background-species
    // electron contribution are computed by the Python layer on both
    // sides (here: exported from lightweaver_tpu's _fd_dC) so the
    // Newton-Raphson algebra itself is compared on identical inputs.
    if (conserveMode)
    {
        std::vector<NpyArray> dCStore(Natoms);
        std::vector<F64View3D> dC;
        for (int ia = 0; ia < Natoms; ++ia)
        {
            dCStore[ia] = npyio::load(ipath("atom" + std::to_string(ia)
                                            + "_dC.npy"));
            int Nl = atoms[ia]->atom.Nlevel;
            dC.emplace_back(F64View3D(dCStore[ia].f64.data(), Nl, Nl,
                                      Nspace));
        }
        NpyArray bgNe = npyio::load(ipath("background_ne.npy"));
        NrTimeDependentData tdData{0.0, {}};
        nr_post_update(ctx, &ctx.activeAtoms, dC,
                       F64View(bgNe.f64.data(), Nspace), tdData, 1.0);
        for (int ia = 0; ia < Natoms; ++ia)
        {
            auto& a = atoms[ia]->atom;
            npyio::save(opath("out_nr_pops_a" + std::to_string(ia)
                              + ".npy"),
                        a.n.data, {a.Nlevel, Nspace});
        }
        npyio::save(opath("out_nr_ne.npy"), ne.f64.data(), {Nspace});
    }

    // ---- Full-Stokes synthesis on the converged state (config 4) -----------
    if (stokesMode)
    {
        std::vector<double> QuvBuf((size_t)3 * Nspect * Nrays * 1, 0.0);
        spect.Quv = F64View4D(QuvBuf.data(), 3, Nspect, Nrays, 1);

        struct PolBufs
        {
            std::vector<double> phiQ, phiU, phiV, psiQ, psiU, psiV;
            std::vector<int32_t> alpha;
            NpyArray shift, strength;
        };
        std::vector<std::unique_ptr<PolBufs>> polStore;

        for (int ia = 0; ia < Natoms; ++ia)
        {
            auto& holder = atoms[ia];
            for (int it = 0; it < (int)holder->trans.size(); ++it)
            {
                Transition& t = holder->trans[it]->trans;
                if (t.type != TransitionType::LINE)
                    continue;
                std::string tpre = "atom" + std::to_string(ia) + "_trans"
                                   + std::to_string(it) + "_";
                NpyArray zAlpha;
                try
                {
                    zAlpha = npyio::load(ipath(tpre + "zeeman_alpha.npy"));
                }
                catch (const std::exception&)
                {
                    continue;       // line not polarisable / not exported
                }
                auto pb = std::make_unique<PolBufs>();
                pb->shift = npyio::load(ipath(tpre + "zeeman_shift.npy"));
                pb->strength = npyio::load(ipath(tpre + "zeeman_strength.npy"));
                int Ncomp = (int)zAlpha.shape[0];
                pb->alpha.resize(Ncomp);
                for (int c = 0; c < Ncomp; ++c)
                    pb->alpha[c] = (int32_t)zAlpha.f64[c];

                int Nlt = (int)t.wavelength.shape(0);
                size_t n = (size_t)Nlt * Nrays * 2 * Nspace;
                pb->phiQ.assign(n, 0.0);
                pb->phiU.assign(n, 0.0);
                pb->phiV.assign(n, 0.0);
                pb->psiQ.assign(n, 0.0);
                pb->psiU.assign(n, 0.0);
                pb->psiV.assign(n, 0.0);
                t.phiQ = F64View4D(pb->phiQ.data(), Nlt, Nrays, 2, Nspace);
                t.phiU = F64View4D(pb->phiU.data(), Nlt, Nrays, 2, Nspace);
                t.phiV = F64View4D(pb->phiV.data(), Nlt, Nrays, 2, Nspace);
                t.psiQ = F64View4D(pb->psiQ.data(), Nlt, Nrays, 2, Nspace);
                t.psiU = F64View4D(pb->psiU.data(), Nlt, Nrays, 2, Nspace);
                t.psiV = F64View4D(pb->psiV.data(), Nlt, Nrays, 2, Nspace);
                t.polarised = true;

                ZeemanComponents zc;
                zc.alpha = I32View(pb->alpha.data(), Ncomp);
                zc.shift = F64View(pb->shift.f64.data(), Ncomp);
                zc.strength = F64View(pb->strength.f64.data(), Ncomp);
                // ref: FormalStokes.cpp:9-80 (polarised Voigt-Faraday
                // profiles), driven as LwMiddleLayer.pyx:2004-2053 does
                t.compute_polarised_profiles(atmos, t.aDamp,
                                             holder->atom.vBroad, zc);
                std::string tag = "a" + std::to_string(ia) + "t"
                                  + std::to_string(it);
                npyio::save(opath("out_phiQ_" + tag + ".npy"),
                            pb->phiQ.data(), {Nlt, Nrays, 2, Nspace});
                npyio::save(opath("out_phiV_" + tag + ".npy"),
                            pb->phiV.data(), {Nlt, Nrays, 2, Nspace});
                npyio::save(opath("out_psiQ_" + tag + ".npy"),
                            pb->psiQ.data(), {Nlt, Nrays, 2, Nspace});
                npyio::save(opath("out_phi_pol_" + tag + ".npy"),
                            holder->trans[it]->phi.data(),
                            {Nlt, Nrays, 2, Nspace});
                polStore.push_back(std::move(pb));
            }
        }

        // updateJ=true: with updateJ=false the reference's stokes_fs_core
        // never binds JDag (FormalStokes.cpp:429-439), so S(0) silently
        // drops the coherent-scattering term sca*J -- with updateJ=true
        // JDag copies J row-by-row before the update (like the scalar
        // core, SimdFullIterationTemplates.hpp:284) and both sides
        // compute the same physics.
        formal_sol_full_stokes_impl(ctx, true, true, ExtraParams{});
        npyio::save(opath("out_I_stokes.npy"), Ibuf.data(), {Nspect, Nrays});
        npyio::save(opath("out_Quv.npy"), QuvBuf.data(), {3, Nspect, Nrays});
    }

    double nIter = (double)(itConverged >= 0 ? itConverged + 1 : -1);
    npyio::save(opath("out_niter.npy"), &nIter, {1});
    npyio::save(opath("out_dJ_hist.npy"), dJHist.data(), {(int64_t)dJHist.size()});
    npyio::save(opath("out_dPops_hist.npy"), dPopsHist.data(), {(int64_t)dPopsHist.size()});

    std::printf("refgold: converged=%d iterations=%d dJ=%.3e\n",
                itConverged >= 0, itConverged + 1,
                dJHist.empty() ? 0.0 : dJHist.back());
    return 0;
}
