"""Command-line interface.

Flag-for-flag compatible with the reference CLI (``nldsc/__main__.py``),
with the reference's quirks fixed (SURVEY Q8-Q10):

* ``.M`` / ``.M_5_50`` sidecars are actually written
* ``--use-M`` is forwarded to the h2 pipeline
* ``-maf`` has a real default (1e-5) instead of crashing when omitted
* ``--std-thr`` default unified to the CLI value 1e-4
"""

from __future__ import annotations

import sys

import click

from .core.logging import enable_file_logging, log
from .version import __version__

__header__ = (
    f"\n==============================================================\n"
    f"* Non-additive LD Score Regression (nldsc-tpu)\tv{__version__}\n"
    f"* TPU-native reimplementation of nldsc (bayarpark/nldsc)\n"
    f"* JAX/XLA/Pallas engine; GNU General Public License v3\n"
    f"==============================================================\n"
)


def handle_exception(func):
    def handler(*args, **kwargs):
        display = kwargs.pop("display", None)
        try:
            return func(*args, **kwargs)
        except Exception as ex:
            log.critical(
                "The program crashed with %s, what: %s\n"
                "Use `--display` flag for traceback",
                ex.__class__.__name__, ex, exc_info=display)
            raise SystemExit(1)

    handler.__name__ = func.__name__
    return handler


@click.group()
@click.version_option(version=__version__)
@click.option("--log-file", is_flag=True, default=False,
              help="Also log to ./nldsc.log")
def main(log_file):
    click.echo(__header__)
    if log_file:
        enable_file_logging()


@main.command("ld", help="Estimate additive and non-additive LD Scores")
@click.option("--bfile", metavar="FILE", required=True,
              help="Path prefix for PLINK .bed/.bim/.fam file or path to one of them")
@click.option("-o", "--out", metavar="FILE",
              help="Path prefix for output. If not specified the DataFrame is printed")
@click.option("-kb", "--ld-wind-kb", metavar="W", type=float,
              help="Window size for LD score estimation in kilo-base pairs (kb)")
@click.option("-cm", "--ld-wind-cm", metavar="W", type=float,
              help="Window size for LD score estimation in centi-morgans (cM)")
@click.option("-maf", "--maf-thr", metavar="F", type=float, default=1e-5,
              help="Minor allele frequency threshold (lower bound)")
@click.option("-std", "--std-thr", metavar="F", type=float, default=1e-4,
              help="Standard deviation threshold for regression residuals")
@click.option("-rsq", "--rsq-thr", metavar="F", type=float, default=None,
              help="R-squared threshold for regression residuals "
                   "(affects dominant window sizes / MD). Default: 1/n_snp")
@click.option("--extra", is_flag=True, default=False,
              help="Include additional information (MAF WSA WSD WSDE RSTD) in the .L2 file")
@click.option("--block-size", metavar="B", type=int, default=512,
              help="SNP rows per device tile")
@click.option("--pallas", is_flag=True, default=False,
              help="Use the fused Pallas kernel instead of the banded-slab "
                   "XLA engine (alias for --engine pallas)")
@click.option("--engine", type=click.Choice(["int8", "f32", "pallas"]),
              default=None,
              help="Compute engine: integer-exact int8 MXU (default), f32 "
                   "slab matmuls, or the fused symmetric Pallas reference "
                   "kernel (measured SLOWER than the default XLA path, "
                   "see PERFORMANCE.md; symmetric only)")
@click.option("--symmetric/--no-symmetric", "symmetric", default=None,
              help="Exploit r-squared symmetry (half-band, default on; "
                   "--no-symmetric forces the full-band engine)")
@click.option("--dot-dtype", type=click.Choice(["int8", "bf16"]),
              default="int8",
              help="MXU contraction dtype for the integer engines (both are "
                   "exact for genotype codes; int8 is ~2x bf16 on v5e)")
@click.option("--split-missing/--no-split-missing", "split_missing",
              default=None,
              help="Per-row missing-data specialization: clean-rate pass + "
                   "exact compact corrections (default: auto, on when <=25% "
                   "of rows carry missing genotypes)")
@click.option("--n-devices", metavar="N", type=int, default=None,
              help="Shard the SNP axis over N devices (default: all local "
                   "devices when more than one is visible)")
@click.option("--shard-axis", type=click.Choice(["snp", "samples", "grid"]),
              default="snp",
              help="Multi-device axis: 'snp' (halo-exchange SNP blocks, "
                   "default), 'samples' (per-tile psum'd sample shards — "
                   "for huge N; composes with --streaming), or 'grid' (2-D "
                   "snp-x-sample mesh; with --streaming, chunks round-robin "
                   "over mesh rows while each row sample-shards its chunk)")
@click.option("--profile-dir", metavar="DIR", default=None,
              help="Capture a jax.profiler trace of the compute pass into "
                   "this directory")
@click.option("--streaming/--no-streaming", "streaming", default=None,
              help="Force the out-of-core engine on/off (default: auto by "
                   "memory footprint)")
@click.option("--chunk-rows", metavar="R", type=int, default=8192,
              help="Pivot rows per streaming chunk")
@click.option("--resume", "resume_path", metavar="DIR", default=None,
              help="Checkpoint directory for chunk-granular resume "
                   "(streaming; one shard file per completed chunk)")
@click.option("--annot", metavar="FILE", default=None,
              help="Per-SNP annotation file (SNP column + one column per "
                   "annotation): compute PARTITIONED LD scores "
                   "(<name>.L2 / <name>.L2D per annotation)")
@click.option("--progress/--no-progress", "progress", default=None,
              help="Percent/ETA progress during the LD pass (default: on "
                   "for runs above 20k SNPs; streaming always logs chunks)")
@click.option("--display", is_flag=True, default=False, help="Display traceback")
@handle_exception
def est_ld(bfile, out, ld_wind_kb, ld_wind_cm, maf_thr, std_thr, rsq_thr,
           extra, block_size, pallas, engine, symmetric, dot_dtype,
           split_missing, n_devices, shard_axis, profile_dir, streaming,
           chunk_rows, resume_path, annot, progress):
    if sum(map(bool, [ld_wind_kb, ld_wind_cm])) != 1:
        raise RuntimeError("Please, specify exactly one --ld-wind option")
    if ld_wind_kb:
        wind_metric, ld_wind = "kbp", ld_wind_kb
    else:
        wind_metric, ld_wind = "cm", ld_wind_cm

    use_pallas = pallas or engine == "pallas"
    use_int8 = None if engine is None else engine != "f32"

    from .ld.pipeline import estimate_lds  # noqa: PLC0415

    df = estimate_lds(
        bfile, ld_wind=ld_wind, wind_metric=wind_metric,
        maf_thr=maf_thr, std_thr=std_thr, rsq_thr=rsq_thr,
        out=out, extra=extra, summary=True,
        block_size=block_size, use_pallas=use_pallas, use_int8=use_int8,
        symmetric=symmetric, int8_dot_dtype=dot_dtype,
        split_missing=split_missing,
        n_devices=n_devices, shard_samples=(shard_axis == "samples"),
        shard_grid=(shard_axis == "grid"),
        profile_dir=profile_dir,
        streaming=streaming, chunk_rows=chunk_rows, resume_path=resume_path,
        annot=annot, progress=progress,
    )
    if df is not None and out is None:
        click.echo(df.to_string(max_rows=40))


@main.command("ld-genome",
              help="Run `ld` over MANY single-chromosome bfiles (glob or "
                   "comma list), one .L2 per bfile. In a multi-host job "
                   "(jax.distributed) the chromosomes round-robin over "
                   "hosts — the job-level scale-out matching the "
                   "reference's one-file-per-chromosome model")
@click.option("--bfiles", metavar="GLOB", required=True,
              help="Glob or comma-separated list of bfile prefixes (or "
                   "paths to their .bed files)")
@click.option("--out-dir", metavar="DIR", required=True,
              help="Directory for the per-chromosome .L2/.M outputs "
                   "(named <prefix-basename>.L2)")
@click.option("-kb", "--ld-wind-kb", metavar="W", type=float,
              help="Window size in kilo-base pairs (kb)")
@click.option("-cm", "--ld-wind-cm", metavar="W", type=float,
              help="Window size in centi-morgans (cM)")
@click.option("-maf", "--maf-thr", metavar="F", type=float, default=1e-5)
@click.option("-std", "--std-thr", metavar="F", type=float, default=1e-4)
@click.option("-rsq", "--rsq-thr", metavar="F", type=float, default=None)
@click.option("--extra", is_flag=True, default=False,
              help="Include MAF WSA WSD WSDE RSTD columns")
@click.option("--streaming/--no-streaming", "streaming", default=None,
              help="Force the out-of-core engine on/off (default: auto)")
@click.option("--chunk-rows", metavar="R", type=int, default=8192)
@click.option("--n-devices", metavar="N", type=int, default=None,
              help="Devices per chromosome run (default: all local)")
@click.option("--shard-axis", type=click.Choice(["snp", "samples", "grid"]),
              default="snp",
              help="Per-chromosome multi-device axis (see `ld`); "
                   "chromosomes still round-robin over hosts")
@click.option("--annot", metavar="FILE", default=None,
              help="Per-SNP annotation file for PARTITIONED LD (matched to "
                   "each bfile by SNP id; genome-wide files work — SNPs "
                   "absent from a chromosome contribute zero rows)")
@click.option("--resume-dir", "resume_dir", metavar="DIR", default=None,
              help="Checkpoint root for chunk-granular resume: each "
                   "chromosome checkpoints into <DIR>/<bfile-basename>/ "
                   "(streaming engine)")
@click.option("--bucket-shapes/--no-bucket-shapes", "bucket_shapes",
              default=True,
              help="Pad each chromosome's compiled shape to a shared "
                   "bucket so a genome reuses ~4 compiled programs "
                   "instead of one per chromosome size (<=33% padded "
                   "compute; outputs identical). Default on")
@click.option("--display", is_flag=True, default=False,
              help="Display traceback")
@handle_exception
def est_ld_genome(bfiles, out_dir, ld_wind_kb, ld_wind_cm, maf_thr,
                  std_thr, rsq_thr, extra, streaming, chunk_rows,
                  n_devices, shard_axis, annot, resume_dir,
                  bucket_shapes):
    import glob as globmod  # noqa: PLC0415
    import os  # noqa: PLC0415
    import re  # noqa: PLC0415

    if sum(map(bool, [ld_wind_kb, ld_wind_cm])) != 1:
        raise RuntimeError("Please, specify exactly one --ld-wind option")
    wind_metric, ld_wind = (("kbp", ld_wind_kb) if ld_wind_kb
                            else ("cm", ld_wind_cm))

    if "," in bfiles:
        paths = [p.strip() for p in bfiles.split(",") if p.strip()]
    elif globmod.has_magic(bfiles):
        paths = sorted(globmod.glob(bfiles))
        if not paths:
            raise RuntimeError(f"No bfiles match {bfiles!r}")
    else:
        paths = [bfiles]
    prefixes = sorted({re.sub(r"\.(bed|bim|fam)$", "", p) for p in paths})
    names = [os.path.basename(p) for p in prefixes]
    if len(set(names)) != len(names):
        dups = sorted({n for n in names if names.count(n) > 1})
        raise RuntimeError(
            "bfile prefixes with identical basenames would overwrite each "
            f"other's outputs in --out-dir: {dups}")

    from .ld.pipeline import estimate_lds  # noqa: PLC0415
    from .parallel.distributed import assign_chromosomes  # noqa: PLC0415

    mine = assign_chromosomes(prefixes)
    os.makedirs(out_dir, exist_ok=True)
    log.info("ld-genome: %d bfiles total, %d on this host", len(prefixes),
             len(mine))
    for i, prefix in enumerate(mine):
        out = os.path.join(out_dir, os.path.basename(prefix) + ".L2")
        log.info("[%d/%d] %s -> %s", i + 1, len(mine), prefix, out)
        resume_path = (os.path.join(resume_dir, os.path.basename(prefix))
                       if resume_dir else None)
        estimate_lds(prefix, ld_wind=ld_wind, wind_metric=wind_metric,
                     maf_thr=maf_thr, std_thr=std_thr, rsq_thr=rsq_thr,
                     out=out, extra=extra, streaming=streaming,
                     chunk_rows=chunk_rows, n_devices=n_devices,
                     shard_samples=(shard_axis == "samples"),
                     shard_grid=(shard_axis == "grid"),
                     annot=annot, resume_path=resume_path,
                     bucket_shapes=bucket_shapes)
    log.info("ld-genome: %d chromosomes done", len(mine))


@main.command("h2", help="Estimate additive and non-additive heritability")
@click.option("--sumstats", metavar="FILE", required=True,
              help="Path to the GWAS sumstats file")
@click.option("--ref-ld", metavar="PTH", required=True,
              help="File/path with LD Scores used as regression predictors")
@click.option("--w-ld", metavar="PTH", required=True,
              help="LD Scores for regression weights (may differ from "
                   "--ref-ld, e.g. scores restricted to regression SNPs — "
                   "the reference requires them equal)")
@click.option("--strategy", type=click.Choice(["one-stg", "two-stg"]),
              default="two-stg", help="Heritability estimation method")
@click.option("--chisq-max", metavar="F", type=float, default=None,
              help="Drop SNPs with chi-square above this "
                   "(default: max(1e-3*N_max, 80))")
@click.option("--n-blocks", metavar="N", type=int, default=200,
              help="Number of jackknife blocks")
@click.option("--intercept-h2", metavar="F", type=float, default=None,
              help="Constrain the additive LD-score regression intercept")
@click.option("--two-step", metavar="F", type=float, default=None,
              help="Two-step estimator chi-square cutoff (default: 30 when "
                   "the intercept is free, disabled with --intercept-h2)")
@click.option("--use-M", "use_m", is_flag=True, default=False,
              help="Use .M file instead of .M_5_50")
@click.option("--partitioned", is_flag=True, default=False,
              help="Partitioned (multi-annotation) h2: --ref-ld columns "
                   "other than CHR/SNP/BP are per-annotation LD scores "
                   "(with per-annotation .M/.M_5_50 sidecars); --w-ld may "
                   "differ from --ref-ld")
@click.option("--on-device", "on_device", is_flag=True, default=False,
              help="Run the regression in f32 on the accelerator "
                   "(compensated jackknife accumulation, measured <=1e-5 "
                   "vs the default f64-on-CPU path; with --partitioned "
                   "the solves use the unrolled decomposition-free "
                   "Cholesky, p <= 31 annotations)")
@click.option("--samp-prev", metavar="P", type=float, default=None,
              help="Sample prevalence (with --pop-prev: report "
                   "liability-scale h2)")
@click.option("--pop-prev", metavar="K", type=float, default=None,
              help="Population prevalence")
@click.option("-s", "--save-to-json", metavar="W", default=None,
              help="Path to file where to write results")
@click.option("--display", is_flag=True, default=False, help="Display traceback")
@handle_exception
def est_h2(sumstats, ref_ld, w_ld, strategy, chisq_max, n_blocks,
           intercept_h2, two_step, use_m, partitioned, on_device,
           samp_prev, pop_prev, save_to_json):
    if partitioned:
        from .h2.pipeline import estimate_h2_partitioned  # noqa: PLC0415

        estimate_h2_partitioned(
            sumstats=sumstats, ref_ld=ref_ld, w_ld=w_ld, n_blocks=n_blocks,
            intercept_h2=intercept_h2, chisq_max=chisq_max, use_m=use_m,
            save_to_json=save_to_json, on_device=on_device)
        return

    from .h2.pipeline import estimate_h2  # noqa: PLC0415

    estimate_h2(
        sumstats=sumstats, ldscore=ref_ld, n_blocks=n_blocks,
        intercept_h2=intercept_h2, chisq_max=chisq_max, use_m=use_m,
        two_step=two_step, strategy=strategy, save_to_json=save_to_json,
        samp_prev=samp_prev, pop_prev=pop_prev,
        w_ldscore=w_ld if w_ld != ref_ld else None, on_device=on_device)


@main.command("convert",
              help="Convert LD scores between nldsc-tpu .L2 and original "
                   "ldsc .l2.ldscore.gz formats (the reference's "
                   "never-written ld_converter)")
@click.option("--to-ldsc", "to_ldsc_", metavar="OUT_PREFIX", default=None,
              help="Write ldsc-format files at this prefix")
@click.option("--from-ldsc", "from_ldsc_", metavar="PREFIX", default=None,
              help="Read ldsc-format files from this prefix")
@click.option("-i", "--input", "input_", metavar="FILE", default=None,
              help="Input .L2 file (with --to-ldsc)")
@click.option("-o", "--out", metavar="FILE", default=None,
              help="Output .L2 file (with --from-ldsc)")
@click.option("--display", is_flag=True, default=False, help="Display traceback")
@handle_exception
def convert(to_ldsc_, from_ldsc_, input_, out):
    from .io.convert import from_ldsc, to_ldsc  # noqa: PLC0415

    if (to_ldsc_ is None) == (from_ldsc_ is None):
        raise RuntimeError("Specify exactly one of --to-ldsc / --from-ldsc")
    if to_ldsc_ is not None:
        if input_ is None:
            raise RuntimeError("--to-ldsc requires -i/--input <file.L2>")
        to_ldsc(input_, to_ldsc_)
    else:
        if out is None:
            raise RuntimeError("--from-ldsc requires -o/--out <file.L2>")
        from_ldsc(from_ldsc_, out)


if __name__ == "__main__":
    sys.exit(main())
