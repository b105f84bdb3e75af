! Fortran bindings for amgcl_tpu via iso_c_binding — capability parity
! with the reference's fortran/amgcl.f90: the same create/solve/destroy
! C API (lib/amgcl_tpu.h), callable from Fortran with zero-copy arrays.
!
! Usage:
!   use amgcl_tpu
!   integer(c_int64_t) :: h, iters
!   real(c_double) :: err
!   h = amgcl_tpu_solver_create(n, ptr, col, val, params // c_null_char)
!   rc = amgcl_tpu_solver_solve(h, rhs, x, n, iters, err)
!   call amgcl_tpu_solver_destroy(h)

module amgcl_tpu
  use iso_c_binding
  implicit none

  interface
     function amgcl_tpu_solver_create(n, ptr, col, val, params_json) &
          bind(C, name="amgcl_tpu_solver_create") result(handle)
       use iso_c_binding
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(in) :: ptr(*)
       integer(c_int64_t), intent(in) :: col(*)
       real(c_double), intent(in) :: val(*)
       character(kind=c_char), intent(in) :: params_json(*)
       integer(c_int64_t) :: handle
     end function amgcl_tpu_solver_create

     function amgcl_tpu_solver_solve(handle, rhs, x, n, iters, error) &
          bind(C, name="amgcl_tpu_solver_solve") result(rc)
       use iso_c_binding
       integer(c_int64_t), value :: handle
       real(c_double), intent(in) :: rhs(*)
       real(c_double), intent(inout) :: x(*)
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(out) :: iters
       real(c_double), intent(out) :: error
       integer(c_int) :: rc
     end function amgcl_tpu_solver_solve

     ! Distributed solver over the device mesh (the role of the
     ! reference MPI binding, lib/amgcl_mpi.h); n_shards = 0 uses every
     ! visible device.  Solve/destroy via the same handle calls.
     function amgcl_tpu_dist_solver_create(n, ptr, col, val, n_shards, &
          params_json) bind(C, name="amgcl_tpu_dist_solver_create") &
          result(handle)
       use iso_c_binding
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(in) :: ptr(*)
       integer(c_int64_t), intent(in) :: col(*)
       real(c_double), intent(in) :: val(*)
       integer(c_int64_t), value :: n_shards
       character(kind=c_char), intent(in) :: params_json(*)
       integer(c_int64_t) :: handle
     end function amgcl_tpu_dist_solver_create

     subroutine amgcl_tpu_solver_destroy(handle) &
          bind(C, name="amgcl_tpu_solver_destroy")
       use iso_c_binding
       integer(c_int64_t), value :: handle
     end subroutine amgcl_tpu_solver_destroy

     ! Parameter-list handles (reference fortran/amgcl.f90 params calls)
     function amgcl_tpu_params_create() &
          bind(C, name="amgcl_tpu_params_create") result(handle)
       use iso_c_binding
       integer(c_int64_t) :: handle
     end function amgcl_tpu_params_create

     subroutine amgcl_tpu_params_seti(prm, name, value) &
          bind(C, name="amgcl_tpu_params_seti")
       use iso_c_binding
       integer(c_int64_t), value :: prm
       character(kind=c_char), intent(in) :: name(*)
       integer(c_int), value :: value
     end subroutine amgcl_tpu_params_seti

     subroutine amgcl_tpu_params_setf(prm, name, value) &
          bind(C, name="amgcl_tpu_params_setf")
       use iso_c_binding
       integer(c_int64_t), value :: prm
       character(kind=c_char), intent(in) :: name(*)
       real(c_double), value :: value
     end subroutine amgcl_tpu_params_setf

     subroutine amgcl_tpu_params_sets(prm, name, value) &
          bind(C, name="amgcl_tpu_params_sets")
       use iso_c_binding
       integer(c_int64_t), value :: prm
       character(kind=c_char), intent(in) :: name(*)
       character(kind=c_char), intent(in) :: value(*)
     end subroutine amgcl_tpu_params_sets

     ! Fortran-indexed (1-based ptr/col) solver create — the natural
     ! call from Fortran code (reference: amgcl_solver_create_f)
     function amgcl_tpu_solver_create_f(n, ptr, col, val, prm) &
          bind(C, name="amgcl_tpu_solver_create_f") result(handle)
       use iso_c_binding
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(in) :: ptr(*)
       integer(c_int64_t), intent(in) :: col(*)
       real(c_double), intent(in) :: val(*)
       integer(c_int64_t), value :: prm
       integer(c_int64_t) :: handle
     end function amgcl_tpu_solver_create_f

     ! Preconditioner-only handles (reference: amgcl_precond_*)
     function amgcl_tpu_precond_create_f(n, ptr, col, val, prm) &
          bind(C, name="amgcl_tpu_precond_create_f") result(handle)
       use iso_c_binding
       integer(c_int64_t), value :: n
       integer(c_int64_t), intent(in) :: ptr(*)
       integer(c_int64_t), intent(in) :: col(*)
       real(c_double), intent(in) :: val(*)
       integer(c_int64_t), value :: prm
       integer(c_int64_t) :: handle
     end function amgcl_tpu_precond_create_f

     function amgcl_tpu_precond_apply(handle, rhs, x, n) &
          bind(C, name="amgcl_tpu_precond_apply") result(rc)
       use iso_c_binding
       integer(c_int64_t), value :: handle
       real(c_double), intent(in) :: rhs(*)
       real(c_double), intent(inout) :: x(*)
       integer(c_int64_t), value :: n
       integer(c_int) :: rc
     end function amgcl_tpu_precond_apply

     subroutine amgcl_tpu_precond_report(handle) &
          bind(C, name="amgcl_tpu_precond_report")
       use iso_c_binding
       integer(c_int64_t), value :: handle
     end subroutine amgcl_tpu_precond_report
  end interface

end module amgcl_tpu
