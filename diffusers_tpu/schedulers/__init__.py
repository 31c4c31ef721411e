from .scheduling_ddim import DDIMScheduler, DDIMSchedulerOutput, DDIMSchedulerState
from .scheduling_ddpm import DDPMScheduler, DDPMSchedulerOutput, DDPMSchedulerState
from .scheduling_dpmsolver_multistep import (
    DPMSolverMultistepScheduler,
    DPMSolverMultistepSchedulerOutput,
    DPMSolverMultistepSchedulerState,
)
from .scheduling_euler_ancestral_discrete import (
    EulerAncestralDiscreteScheduler,
    EulerAncestralDiscreteSchedulerOutput,
    EulerAncestralDiscreteSchedulerState,
)
from .scheduling_euler_discrete import (
    EulerDiscreteScheduler,
    EulerDiscreteSchedulerOutput,
    EulerDiscreteSchedulerState,
)
from .scheduling_flow_match_euler_discrete import (
    FlowMatchEulerDiscreteScheduler,
    FlowMatchEulerDiscreteSchedulerOutput,
    FlowMatchEulerDiscreteSchedulerState,
    calculate_shift,
)
from .scheduling_utils import KarrasDiffusionSchedulers, SchedulerMixin, SchedulerOutput
from .scheduling_heun_discrete import HeunDiscreteScheduler, HeunDiscreteSchedulerOutput, HeunDiscreteSchedulerState
from .scheduling_lcm import LCMScheduler, LCMSchedulerOutput, LCMSchedulerState
from .scheduling_lms_discrete import LMSDiscreteScheduler, LMSDiscreteSchedulerOutput, LMSDiscreteSchedulerState
from .scheduling_pndm import PNDMScheduler, PNDMSchedulerOutput, PNDMSchedulerState
from .scheduling_unipc_multistep import (
    UniPCMultistepScheduler,
    UniPCMultistepSchedulerOutput,
    UniPCMultistepSchedulerState,
)
from .scheduling_ltx_euler_ancestral_rf import (
    LTXEulerAncestralRFScheduler,
    LTXEulerAncestralRFSchedulerOutput,
    LTXEulerAncestralRFSchedulerState,
)
from .scheduling_minimax_h3 import MiniMaxH3Scheduler, MiniMaxH3SchedulerOutput, MiniMaxH3SchedulerState
from .scheduling_vq_diffusion import VQDiffusionScheduler, VQDiffusionSchedulerOutput, VQDiffusionSchedulerState
from .scheduling_dpmsolver_multistep_inverse import DPMSolverMultistepInverseScheduler
from .scheduling_helios import HeliosScheduler, HeliosSchedulerOutput, HeliosSchedulerState
from .scheduling_helios_dmd import HeliosDMDScheduler, HeliosDMDSchedulerOutput, HeliosDMDSchedulerState
from .scheduling_ddim_inverse import DDIMInverseScheduler, DDIMInverseSchedulerOutput, DDIMInverseSchedulerState
from .scheduling_deis_multistep import DEISMultistepScheduler, DEISMultistepSchedulerOutput, DEISMultistepSchedulerState
from .scheduling_tcd import TCDScheduler, TCDSchedulerOutput, TCDSchedulerState
from .scheduling_edm_euler import EDMEulerScheduler, EDMEulerSchedulerOutput, EDMEulerSchedulerState
from .scheduling_k_dpm_2_discrete import (
    KDPM2DiscreteScheduler,
    KDPM2DiscreteSchedulerOutput,
    KDPM2DiscreteSchedulerState,
)
from .scheduling_dpmsolver_singlestep import (
    DPMSolverSinglestepScheduler,
    DPMSolverSinglestepSchedulerOutput,
    DPMSolverSinglestepSchedulerState,
)
from .scheduling_ipndm import IPNDMScheduler, IPNDMSchedulerOutput, IPNDMSchedulerState
from .scheduling_consistency_models import (
    CMStochasticIterativeScheduler,
    CMStochasticIterativeSchedulerOutput,
    CMStochasticIterativeSchedulerState,
)
from .scheduling_repaint import RePaintScheduler, RePaintSchedulerOutput, RePaintSchedulerState
from .scheduling_unclip import UnCLIPScheduler, UnCLIPSchedulerOutput, UnCLIPSchedulerState
from .scheduling_sasolver import SASolverScheduler, SASolverSchedulerOutput, SASolverSchedulerState
from .scheduling_parallel import DDIMParallelScheduler, DDPMParallelScheduler
from .scheduling_edm_dpmsolver_multistep import (
    EDMDPMSolverMultistepScheduler,
    EDMDPMSolverMultistepSchedulerOutput,
    EDMDPMSolverMultistepSchedulerState,
)
from .scheduling_k_dpm_2_ancestral_discrete import (
    KDPM2AncestralDiscreteScheduler,
    KDPM2AncestralDiscreteSchedulerOutput,
    KDPM2AncestralDiscreteSchedulerState,
)
from .scheduling_flow_match_heun_discrete import (
    FlowMatchHeunDiscreteScheduler,
    FlowMatchHeunDiscreteSchedulerOutput,
)
from .scheduling_scm import SCMScheduler, SCMSchedulerOutput
from .scheduling_dpmsolver_sde import DPMSolverSDEScheduler, DPMSolverSDESchedulerOutput
from .scheduling_ddim_cogvideox import CogVideoXDDIMScheduler, CogVideoXDDIMSchedulerOutput
from .scheduling_sde_ve import ScoreSdeVeScheduler, SdeVeOutput, ScoreSdeVeSchedulerState
from .scheduling_amused import AmusedScheduler, AmusedSchedulerOutput, AmusedSchedulerState
from .scheduling_cosine_dpmsolver_multistep import (
    CosineDPMSolverMultistepScheduler,
    CosineDPMSolverMultistepSchedulerOutput,
    CosineDPMSolverMultistepSchedulerState,
)
from .scheduling_flow_match_lcm import (
    FlowMatchLCMScheduler,
    FlowMatchLCMSchedulerOutput,
    FlowMatchLCMSchedulerState,
)
from .scheduling_consistency_decoder import (
    ConsistencyDecoderScheduler,
    ConsistencyDecoderSchedulerOutput,
    ConsistencyDecoderSchedulerState,
)
from .scheduling_block_refinement import (
    BlockRefinementScheduler,
    BlockRefinementSchedulerOutput,
    BlockRefinementSchedulerState,
)
from .scheduling_discrete_ddim import (
    DiscreteDDIMScheduler,
    DiscreteDDIMSchedulerOutput,
    DiscreteDDIMSchedulerState,
)
from .scheduling_entropy_bound import (
    EntropyBoundScheduler,
    EntropyBoundSchedulerOutput,
    EntropyBoundSchedulerState,
)
from .scheduling_dpm_cogvideox import CogVideoXDPMScheduler, CogVideoXDPMSchedulerOutput
from .scheduling_flow_map_euler_discrete import (
    FlowMapEulerDiscreteScheduler,
    FlowMapEulerDiscreteSchedulerOutput,
    FlowMapEulerDiscreteSchedulerState,
)
